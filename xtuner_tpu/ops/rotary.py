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


def _rotate(x, cos, sin):
    """Half-split rotation with fp32 math but NO fp32 concat materialization:
    o1 = x1*c - x2*s; o2 = x2*c + x1*s, each half cast to the input dtype
    before the single output concat. Mathematically identical to
    x*cos + rotate_half(x)*sin (HF cos/sin duplicate their halves), but the
    big (L, H, D) fp32 intermediates never hit HBM — at 64k these slices
    showed up as ~100ms of slice/negate/concat fusions per step."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., :half]
    s = sin[..., :half]
    o1 = (x1 * c - x2 * s).astype(x.dtype)
    o2 = (x2 * c + x1 * s).astype(x.dtype)
    return jnp.concatenate([o1, o2], axis=-1)


def apply_rotary_emb(q, k, cos, sin):
    """q: (B, L, Hq, D), k: (B, L, Hk, D), cos/sin: (B, L, D) fp32.

    Rotation is computed in fp32 and cast back (HF parity).
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return _rotate(q, cos, sin), _rotate(k, cos, sin)
