"""Rotary position embedding application.

Reference: xtuner/v1/ops/rotary_emb.py (dispatched apply_rotary_emb). Pure jnp;
XLA fuses it into the surrounding QK projections. Uses the HF "rotate_half"
convention (paired dims are [0:d/2] and [d/2:d]) so loaded checkpoints match.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_emb(q, k, cos, sin):
    """q: (B, L, Hq, D), k: (B, L, Hk, D), cos/sin: (B, L, D) fp32.

    Rotation is computed in fp32 and cast back (HF parity).
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * cos + rotate_half(q32) * sin
    k_out = k32 * cos + rotate_half(k32) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
