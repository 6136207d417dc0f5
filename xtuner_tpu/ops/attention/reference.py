"""Eager reference attention (parity oracle).

Semantics match the reference's eager path (xtuner/v1/ops/attn_imp.py:277-296,
bitwise-HF fp32 softmax) with the varlen mask the CUDA flash-varlen kernels
implement from cu_seqlens, here derived from segment ids. Also carries the
GPT-OSS extensions: sliding window and attention sinks
(ops/flash_attn/flash_sink_varlen_attn_gpt_oss.py semantics).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def make_attention_mask(segment_ids, causal: bool = True, window: Optional[int] = None):
    """(B, L) segment ids -> (B, 1, L, L) boolean mask. 0 = padding."""
    seg_q = segment_ids[:, :, None]
    seg_k = segment_ids[:, None, :]
    mask = (seg_q == seg_k) & (seg_q != 0)
    length = segment_ids.shape[-1]
    pos = jnp.arange(length)
    if causal:
        mask = mask & (pos[:, None] >= pos[None, :])
    if window is not None:
        mask = mask & (pos[:, None] - pos[None, :] < window)
    return mask[:, None, :, :]


def repeat_kv(x, n_rep: int):
    """(B, L, Hkv, D) -> (B, L, Hkv*n_rep, D), HF repeat_kv layout parity."""
    if n_rep == 1:
        return x
    b, l, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, l, h, n_rep, d)).reshape(b, l, h * n_rep, d)


def reference_attention(q, k, v, segment_ids, *, causal: bool = True, scale: Optional[float] = None,
                        window: Optional[int] = None, sinks=None):
    """q: (B, L, Hq, D); k, v: (B, L, Hkv, D); segment_ids: (B, L).

    sinks: optional (Hq,) per-head sink logits added to the softmax
    denominator (GPT-OSS `s_aux`).
    Returns (B, L, Hq, D) in q.dtype; softmax in fp32.
    """
    num_q_heads, num_kv_heads = q.shape[2], k.shape[2]
    k = repeat_kv(k, num_q_heads // num_kv_heads)
    v = repeat_kv(v, num_q_heads // num_kv_heads)
    if scale is None:
        scale = q.shape[-1] ** -0.5

    logits = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = make_attention_mask(segment_ids, causal=causal, window=window)
    logits = jnp.where(mask, logits, -jnp.inf)

    if sinks is not None:
        # softmax over [logits, sink] but only value-weight the real columns
        sink = jnp.broadcast_to(sinks.astype(jnp.float32)[None, :, None, None],
                                (*logits.shape[:3], 1))
        m = jnp.max(jnp.concatenate([logits, sink], axis=-1), axis=-1, keepdims=True)
        exp_logits = jnp.exp(logits - m)
        denom = jnp.sum(exp_logits, axis=-1, keepdims=True) + jnp.exp(sink - m)
        probs = exp_logits / denom
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        m = jnp.maximum(m, -1e30)  # fully-masked (padding) query rows: avoid inf-inf
        exp_logits = jnp.exp(logits - m)
        denom = jnp.sum(exp_logits, axis=-1, keepdims=True)
        probs = exp_logits / jnp.maximum(denom, 1e-37)

    out = jnp.einsum("bhlm,bmhd->blhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
