"""DSA sparse attention ops (DeepSeek V3.2).

Reference: xtuner/v1/ops/sparse_mla/ (TileLang fwd/bwd + indexer kernels,
pytorch ref :77) and module/attention/dsa_*.py. Two pieces:

1. Lightning indexer: cheap (small-dim, few heads) causal score matrix
   I[t, s] = sum_h w_h(q_t) * relu(q_idx_t[h] . k_idx_s)  — O(L^2) but tiny
   constants (the reference runs it in fp8).
2. Top-k token selection per query, then attention restricted to the selected
   keys (gather + (B, L, H, K) logits instead of (B, H, L, L)).

This is the correctness-level jnp implementation (the oracle the reference
keeps as ops/sparse_mla/pytorch.py); the Pallas gather-attention kernel is a
later perf item. With top_k >= seq_len it reduces exactly to dense causal
attention, which is how the tests pin the semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def indexer_scores(q_idx, k_idx, head_weights, segment_ids=None):
    """q_idx, k_idx: (B, L, Hi, Di); head_weights: (B, L, Hi) -> (B, L, L).

    I[t, s] = sum_h w[t, h] * relu(q_idx[t, h] . k_idx[s, h]), causal + same-doc.
    """
    scores = jnp.einsum("bthd,bshd->bths", q_idx.astype(jnp.float32),
                        k_idx.astype(jnp.float32))
    scores = jnp.einsum("bths,bth->bts", jax.nn.relu(scores),
                        head_weights.astype(jnp.float32))
    l = scores.shape[1]
    pos = jnp.arange(l)
    mask = pos[:, None] >= pos[None, :]
    if segment_ids is not None:
        mask = mask & (segment_ids[:, :, None] == segment_ids[:, None, :]) \
            & (segment_ids[:, :, None] != 0)
    else:
        mask = mask[None]
    return jnp.where(mask, scores, -jnp.inf)


def indexer_block_stats(q_idx, k_idx, head_weights, segment_ids, block: int):
    """Chunked, block-pooled indexer statistics — the O(L^2)-memory-free path
    for 64k+ DSA training (the module-level (B, L, L) score materialization
    was the round-2 OOM blocker; kernels were always fine).

    Scans KEY BLOCKS of `block` tokens; each iteration holds one (B, L,
    block) score slab (jax.checkpoint'ed, so backward recomputes it too).
    Returns:
      pooled_lse (B, L, nk) f32 — logsumexp of scores over each key block
        per query token (the block-level distillation input);
      blockmax (B, nq, nk) f32 — per-(q-block, k-block) max score (the
        selection input; -inf where causally/doc invalid).
    """
    b, l, hi, di = q_idx.shape
    nk = l // block
    nq = l // block
    q32 = q_idx.astype(jnp.float32)
    w32 = head_weights.astype(jnp.float32)
    pos = jnp.arange(l)

    @jax.checkpoint
    def body(carry, jb):
        ks = jax.lax.dynamic_slice_in_dim(k_idx, jb * block, block, axis=1)
        seg_k = jax.lax.dynamic_slice_in_dim(segment_ids, jb * block, block, axis=1)
        s = jnp.einsum("bthd,bshd->bths", q32, ks.astype(jnp.float32))
        s = jnp.einsum("bths,bth->bts", jax.nn.relu(s), w32)  # (B, L, block)
        kpos = jb * block + jnp.arange(block)
        mask = ((pos[:, None] >= kpos[None, :])[None]
                & (segment_ids[:, :, None] == seg_k[:, None, :])
                & (seg_k[:, None, :] != 0))
        s = jnp.where(mask, s, -jnp.inf)
        col_lse = jax.nn.logsumexp(s, axis=-1)  # (B, L)
        bm = jnp.max(s.reshape(b, nq, block, block), axis=(2, 3))  # (B, nq)
        return carry, (col_lse, bm)

    _, (lses, bms) = jax.lax.scan(body, 0, jnp.arange(nk))
    pooled_lse = jnp.moveaxis(lses, 0, -1)  # (B, L, nk)
    blockmax = jnp.moveaxis(bms, 0, -1)  # (B, nq, nk)
    return pooled_lse, blockmax


def topk_select(scores, top_k: int):
    """(B, L, L) -> indices (B, L, K) of the best keys per query (causal slots
    beyond the valid prefix select index 0 with -inf score; they are re-masked
    in the attention)."""
    _, idx = jax.lax.top_k(scores, top_k)
    return idx.astype(jnp.int32)


def sparse_gather_attention(q, k, v, select_idx, select_scores, *, scale: Optional[float] = None,
                            return_probs: bool = False):
    """q: (B, L, Hq, Dq); k: (B, L, Hkv, Dq); v: (B, L, Hkv, Dv);
    select_idx: (B, L, K); select_scores: (B, L, K) (-inf marks invalid slots).

    Returns (B, L, Hq, Dv). GQA via head repeat on the gathered keys.
    """
    b, l, hq, dq = q.shape
    hkv = k.shape[2]
    dv = v.shape[-1]
    kk = select_idx.shape[-1]
    scale = scale if scale is not None else dq ** -0.5

    # gather selected keys/values per query: (B, L, K, Hkv, D)
    k_sel = jnp.take_along_axis(k[:, :, None], select_idx[..., None, None], axis=1)
    v_sel = jnp.take_along_axis(v[:, :, None], select_idx[..., None, None], axis=1)
    # -> (B, L, K, Hkv, D); repeat kv heads to Hq
    rep = hq // hkv
    if rep > 1:
        k_sel = jnp.repeat(k_sel, rep, axis=3)
        v_sel = jnp.repeat(v_sel, rep, axis=3)

    logits = jnp.einsum("blhd,blkhd->blhk", q.astype(jnp.float32),
                        k_sel.astype(jnp.float32)) * scale
    valid = jnp.isfinite(select_scores)[:, :, None, :]  # (B, L, 1, K)
    logits = jnp.where(valid, logits, -1e30)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -1e29)
    p = jnp.exp(logits - m)
    p = jnp.where(valid, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-37)
    out = jnp.einsum("blhk,blkhd->blhd", p, v_sel.astype(jnp.float32))
    if return_probs:
        return out.astype(q.dtype), p  # (B, L, Hq, K)
    return out.astype(q.dtype)


def indexer_kl_loss(select_scores, attn_probs, valid_tokens=None):
    """Indexer training signal (DSA): KL(mean-head attention distribution ||
    indexer softmax over the selected slots). The indexer gets NO gradient
    from the main LM loss (selection is discrete); the reference trains it by
    distilling the dense/selected attention distribution.

    select_scores: (B, L, K) (-inf invalid); attn_probs: (B, L, Hq, K).
    """
    target = jax.lax.stop_gradient(jnp.mean(attn_probs, axis=2))  # (B, L, K)
    valid = jnp.isfinite(select_scores)
    logz = jax.nn.log_softmax(jnp.where(valid, select_scores, -1e30), axis=-1)
    kl = -jnp.sum(target * logz, axis=-1)  # cross-entropy part (KL up to const)
    if valid_tokens is not None:
        kl = kl * valid_tokens
        return jnp.sum(kl) / jnp.maximum(jnp.sum(valid_tokens), 1.0)
    return jnp.mean(kl)
