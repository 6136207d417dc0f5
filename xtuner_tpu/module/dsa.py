"""DSA: sparse MLA attention module (DeepSeek V3.2).

Reference: xtuner/v1/module/attention/dsa_mla.py (389 LoC) — MLA attention
with the lightning indexer selecting top-k tokens per query. The cross-layer
top-k sharing cache (dsa_topk_sharing.py) maps to passing `select_idx`
between layers (optional arg here).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from pydantic import ConfigDict

from ..ops.rms_norm import rms_norm
from ..ops.rotary import apply_rotary_emb
from ..ops.sparse_mla import indexer_scores, sparse_gather_attention, topk_select
from ..parallel.sharding import ShardCtx
from .mla import MLAConfig, _deinterleave_rope, mla_param_specs, mla_softmax_scale
from .params import ParamSpec


class DSAConfig(MLAConfig):
    """MLA + lightning-indexer fields (reference DSAConfig surface)."""

    model_config = ConfigDict(extra="forbid")
    index_n_heads: int = 4
    index_head_dim: int = 32
    index_top_k: int = 512
    # "token": per-token top-k + gather (reference TileLang semantics; jnp
    # path, O(L*K) gathered memory). "block": TPU-native Pallas kernel —
    # selection quantized to key BLOCKS of `index_block` tokens,
    # index_top_k/index_block blocks kept per q-block
    # (ops/attention/block_sparse.py).
    select_granularity: str = "token"
    index_block: int = 256


def dsa_param_specs(cfg: DSAConfig, hidden_size: int, init_scale: float = 0.02) -> dict:
    specs = mla_param_specs(cfg, hidden_size, init_scale)
    hi, di = cfg.index_n_heads, cfg.index_head_dim
    specs["idx_q_proj"] = {"w": ParamSpec((hidden_size, hi * di), ("embed_shard", None),
                                          scale=init_scale)}
    specs["idx_k_proj"] = {"w": ParamSpec((hidden_size, di), ("embed_shard", None),
                                          scale=init_scale)}
    specs["idx_w_proj"] = {"w": ParamSpec((hidden_size, hi), ("embed_shard", None),
                                          scale=init_scale)}
    return specs


def dsa_cached_forward(p: dict, cfg: DSAConfig, x, cos, sin, cache_c, cache_r,
                       cache_len, rope_scaling=None, kv_mask=None):
    """Indexer-aware compressed-KV DSA decode (module/mla.py:100-165 math plus
    the lightning indexer's top-k token selection at every step).

    cache_c packs latent ‖ indexer-key per position — (B, S, 1,
    kv_lora_rank + index_head_dim) — so every cache consumer keeps the
    (k, v) pair structure; cache_r is the shared rope key as in MLA.

    Identical to full MLA decode while the valid context fits inside
    index_top_k; beyond that, decode follows the TRAINING sparse pattern
    (token-granular top-k — reference serving engines also select per token
    even for block-granular training, dsa_mla.py)."""
    b, c, _ = x.shape
    nh, rank = cfg.num_attention_heads, cfg.kv_lora_rank
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    hi, di = cfg.index_n_heads, cfg.index_head_dim
    s_max = cache_c.shape[1]

    if cfg.q_lora_rank is not None:
        q = x @ p["q_a_proj"]["w"]
        q = rms_norm(q, p["q_a_norm"], cfg.rms_norm_eps)
        q = q @ p["q_b_proj"]["w"]
    else:
        q = x @ p["q_proj"]["w"]
    q = q.reshape(b, c, nh, cfg.qk_head_dim)
    q_nope, q_rope = q[..., :dn], q[..., dn:]

    kv = x @ p["kv_a_proj"]["w"]
    kv_c, k_rope = kv[..., :rank], kv[..., rank:]
    kv_c = rms_norm(kv_c, p["kv_a_norm"], cfg.rms_norm_eps)
    q_rope = _deinterleave_rope(q_rope)
    k_rope = _deinterleave_rope(k_rope[:, :, None, :])
    q_rope, k_rope = apply_rotary_emb(q_rope, k_rope, cos, sin)

    import jax

    k_idx = x @ p["idx_k_proj"]["w"]  # (B, C, di), shared across idx heads
    packed = jnp.concatenate([kv_c, k_idx], axis=-1)
    cache_c = jax.lax.dynamic_update_slice(
        cache_c, packed[:, :, None, :].astype(cache_c.dtype), (0, cache_len, 0, 0))
    cache_r = jax.lax.dynamic_update_slice(
        cache_r, k_rope.astype(cache_r.dtype), (0, cache_len, 0, 0))

    lat = cache_c[:, :, 0, :rank].astype(jnp.float32)   # (B, S, rank)
    idxk = cache_c[:, :, 0, rank:].astype(jnp.float32)  # (B, S, di)
    rop = cache_r[:, :, 0].astype(jnp.float32)

    kpos = jnp.arange(s_max)[None, :]
    qpos = cache_len + jnp.arange(c)[:, None]
    mask = jnp.broadcast_to((kpos <= qpos)[None], (b, c, s_max))
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, :]

    # lightning indexer (ops/sparse_mla.indexer_scores):
    # I[t, s] = sum_h w[t, h] * relu(q_idx[t, h] . k_idx[s])
    q_idx = (x @ p["idx_q_proj"]["w"]).reshape(b, c, hi, di).astype(jnp.float32)
    w_idx = (x @ p["idx_w_proj"]["w"]).astype(jnp.float32)  # (B, C, Hi)
    iscore = jnp.einsum("bths,bth->bts",
                        jnp.maximum(jnp.einsum("bthd,bsd->bths", q_idx, idxk), 0.0),
                        w_idx)
    iscore = jnp.where(mask, iscore, -jnp.inf)
    top_k = min(cfg.index_top_k, s_max)
    _, sel = jax.lax.top_k(iscore, top_k)  # (B, C, K)
    sel_mask = jnp.zeros((b, c, s_max), bool).at[
        jnp.arange(b)[:, None, None], jnp.arange(c)[None, :, None], sel].set(True)
    # all-(-inf) rows select arbitrary slots; re-ANDing the validity mask
    # excludes them, so short contexts reduce exactly to full attention
    mask = mask & sel_mask

    wkb = p["kv_b_proj"]["w"].reshape(rank, nh, dn + dv)
    w_uk, w_uv = wkb[..., :dn], wkb[..., dn:]
    q_lat = jnp.einsum("bcnd,rnd->bcnr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    scale = mla_softmax_scale(cfg, rope_scaling)
    logits = (jnp.einsum("bcnr,bsr->bncs", q_lat, lat)
              + jnp.einsum("bcnd,bsd->bncs", q_rope.astype(jnp.float32), rop)) * scale
    logits = jnp.where(mask[:, None], logits, -1e30)  # (B, 1, C, S) over heads
    probs = jax.nn.softmax(logits, axis=-1)
    out_lat = jnp.einsum("bncs,bsr->bcnr", probs, lat)
    o = jnp.einsum("bcnr,rnd->bcnd", out_lat, w_uv.astype(jnp.float32)).astype(x.dtype)
    o = o.reshape(b, c, nh * dv)
    return o @ p["o_proj"]["w"], cache_c, cache_r


def dsa_forward(p: dict, cfg: DSAConfig, x, cos, sin, segment_ids, sc: ShardCtx,
                rope_scaling=None, select_idx=None, **_):
    """x: (B, L, H) -> (out, select_idx) — select_idx reusable by later layers
    (the reference's cross-layer top-k sharing)."""
    b, l, _ = x.shape
    nh = cfg.num_attention_heads

    # ---- MLA projections (same math as mla_forward) ----
    if cfg.q_lora_rank is not None:
        q = x @ p["q_a_proj"]["w"]
        q = rms_norm(q, p["q_a_norm"], cfg.rms_norm_eps)
        q = q @ p["q_b_proj"]["w"]
    else:
        q = x @ p["q_proj"]["w"]
    q = q.reshape(b, l, nh, cfg.qk_head_dim)
    q_nope, q_rope = q[..., : cfg.qk_nope_head_dim], q[..., cfg.qk_nope_head_dim:]

    kv = x @ p["kv_a_proj"]["w"]
    kv_c, k_rope = kv[..., : cfg.kv_lora_rank], kv[..., cfg.kv_lora_rank:]
    kv_c = rms_norm(kv_c, p["kv_a_norm"], cfg.rms_norm_eps)
    kv = (kv_c @ p["kv_b_proj"]["w"]).reshape(b, l, nh, cfg.qk_nope_head_dim + cfg.v_head_dim)
    k_nope, v = kv[..., : cfg.qk_nope_head_dim], kv[..., cfg.qk_nope_head_dim:]
    # de-interleave rope dims to half-split layout (HF DeepSeek convention,
    # see module/mla.py:_deinterleave_rope)
    k_rope = _deinterleave_rope(k_rope[:, :, None, :])
    q_rope = _deinterleave_rope(q_rope)
    q_rope, k_rope = apply_rotary_emb(q_rope, k_rope, cos, sin)
    k_rope = jnp.broadcast_to(k_rope, (b, l, nh, cfg.qk_rope_head_dim))
    q_full = jnp.concatenate([q_nope, q_rope], axis=-1)
    k_full = jnp.concatenate([k_nope, k_rope], axis=-1)

    # ---- lightning indexer + top-k selection (or reuse a shared one) ----
    hi, di = cfg.index_n_heads, cfg.index_head_dim
    scale = mla_softmax_scale(cfg, rope_scaling)

    if cfg.select_granularity == "block":
        if l % cfg.index_block != 0:
            raise ValueError(
                f"select_granularity='block' needs seq len ({l}) divisible by "
                f"index_block ({cfg.index_block}); pad the pack length or "
                f"change index_block")
        return _dsa_block_forward(p, cfg, x, q_full, k_full, v, segment_ids,
                                  scale, select_idx)

    scores = None
    if select_idx is None:
        q_idx = (x @ p["idx_q_proj"]["w"]).reshape(b, l, hi, di)
        k_idx = (x @ p["idx_k_proj"]["w"]).reshape(b, l, 1, di)
        k_idx = jnp.broadcast_to(k_idx, (b, l, hi, di))
        w_idx = x @ p["idx_w_proj"]["w"]  # (B, L, Hi)
        scores = indexer_scores(q_idx, k_idx, w_idx, segment_ids)
        top_k = min(cfg.index_top_k, l)
        select_idx = topk_select(scores, top_k)
        select_scores = jnp.take_along_axis(scores, select_idx, axis=-1)
    else:
        # shared top-k: validity re-derived from causal/doc structure
        pos = jnp.arange(l)
        causal_ok = jnp.take_along_axis(
            jnp.broadcast_to(pos[None, None, :], (b, l, l)), select_idx, axis=-1
        ) <= pos[None, :, None]
        select_scores = jnp.where(causal_ok, 0.0, -jnp.inf)

    o, attn_probs = sparse_gather_attention(q_full, k_full, v, select_idx, select_scores,
                                            scale=scale, return_probs=True)
    # indexer distillation loss (the ONLY gradient path into the indexer)
    from ..ops.sparse_mla import indexer_kl_loss

    idx_loss = (indexer_kl_loss(select_scores, attn_probs,
                                (segment_ids != 0).astype(jnp.float32))
                if scores is not None else jnp.float32(0.0))
    o = o.reshape(b, l, nh * cfg.v_head_dim)
    return o @ p["o_proj"]["w"], select_idx, idx_loss


def _dsa_block_forward(p, cfg: DSAConfig, x, q_full, k_full, v, segment_ids,
                       scale, select_idx):
    """Block-granular DSA: Pallas block-sparse kernel with the indexer
    distilled at BLOCK level — KL(block attention mass || softmax of pooled
    indexer scores over the selected blocks). Indexer scoring is CHUNKED
    over key blocks (ops/sparse_mla.indexer_block_stats): no (B, L, L)
    materialization, so 64k DSA training fits (round-2 TODO.md:42)."""
    import jax

    from ..ops.attention.block_sparse import (block_sparse_attention,
                                              select_from_blockmax)
    from ..ops.sparse_mla import indexer_block_stats

    b, l, nh, _ = q_full.shape
    hi, di = cfg.index_n_heads, cfg.index_head_dim
    block = cfg.index_block
    num_sel = max(cfg.index_top_k // block, 1)

    q_idx = (x @ p["idx_q_proj"]["w"]).reshape(b, l, hi, di)
    k_idx = (x @ p["idx_k_proj"]["w"]).reshape(b, l, 1, di)
    k_idx = jnp.broadcast_to(k_idx, (b, l, hi, di))
    w_idx = x @ p["idx_w_proj"]["w"]
    # pooled (B, L, nk) logsumexp per key block + (B, nq, nk) block maxes
    pooled, blockmax = indexer_block_stats(q_idx, k_idx, w_idx, segment_ids, block)

    if select_idx is None:
        select_idx = select_from_blockmax(jax.lax.stop_gradient(blockmax), num_sel)

    o, mass = block_sparse_attention(q_full, k_full, v, select_idx, segment_ids,
                                     scale=scale, block=block, return_block_mass=True)

    # block-level distillation: pooled (logsumexp over the block's keys)
    # indexer scores at the selected slots vs the attention block mass
    sel_per_row = jnp.repeat(select_idx, block, axis=1)  # (B, L, S)
    sel_scores = jnp.take_along_axis(pooled, jnp.maximum(sel_per_row, 0), axis=-1)
    sel_scores = jnp.where(sel_per_row >= 0, sel_scores, -jnp.inf)
    target = jax.lax.stop_gradient(jnp.mean(mass, axis=2))  # (B, L, S)
    target = target / jnp.maximum(jnp.sum(target, axis=-1, keepdims=True), 1e-9)
    logz = jax.nn.log_softmax(jnp.where(jnp.isfinite(sel_scores), sel_scores, -1e30),
                              axis=-1)
    valid = (segment_ids != 0).astype(jnp.float32)
    kl = -jnp.sum(target * logz, axis=-1) * valid
    idx_loss = jnp.sum(kl) / jnp.maximum(jnp.sum(valid), 1.0)

    o = o.reshape(b, l, nh * cfg.v_head_dim)
    return o @ p["o_proj"]["w"], select_idx, idx_loss
