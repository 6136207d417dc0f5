"""Varlen packed attention — op family.

Reference: xtuner/v1/ops/flash_attn/ (flash-attn2/3 CUDA wrappers + CPU
protocol impl) and ops/attn_imp.py (eager / flex / flash registry). TPU
redesign: packed documents are expressed with segment ids instead of
cu_seqlens; the mask is (seg_q == seg_k) & causal & valid, block-diagonal by
construction.

Implementations:
- "reference": fp32-softmax eager jnp — HF-parity oracle (ops/attn_imp.py:277-296).
- "pallas": flash kernel with online softmax + segment-aware block skipping.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax

from .reference import reference_attention

_IMPLS = {"reference": None, "pallas": None}  # lazily populated


def get_attention(impl: Optional[str] = None):
    impl = impl or os.environ.get("XTUNER_ATTN_IMPL")
    if impl is None:
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "reference"
    if impl in ("reference", "eager", "xla"):
        return reference_attention
    if impl == "pallas":
        from .flash import flash_attention

        return flash_attention
    raise KeyError(f"Unknown attention impl {impl!r}")


def attention(q, k, v, segment_ids, *, causal: bool = True, scale: Optional[float] = None,
              window: Optional[int] = None, sinks=None, impl: Optional[str] = None):
    return get_attention(impl)(q, k, v, segment_ids, causal=causal, scale=scale, window=window, sinks=sinks)
