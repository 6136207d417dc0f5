"""RMSNorm.

Reference: xtuner/v1/ops/rms_norm/ (1.1k LoC of Triton fwd/bwd). On TPU, XLA
fuses the reduction + rsqrt + scale into neighbouring ops, so the kernel is
three lines of jnp; no Pallas needed (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-6, zero_centered: bool = False):
    """Computed in fp32 regardless of input dtype (matches reference semantics)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if zero_centered:
        w = 1.0 + w
    return (x * w).astype(dtype)
