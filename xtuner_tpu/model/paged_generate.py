"""Paged-KV rollout engine with continuous batching.

Reference: xtuner/v1 rollouts ride vLLM/LMDeploy-class engines
(rl/rollout/worker.py:510 + lmdeploy.py/vllm.py/sglang.py): block-paged KV,
prefix sharing, and continuous batching (admit new sequences as others
finish). TPU redesign on top of module/kv_cache.py:

- ONE decode program compiled for a fixed slot count `max_batch`: per-slot
  sequence lengths (not a single scalar cache_len), per-slot active mask,
  block tables as gather indices. Sequences of different lengths decode in
  the same batched step.
- Continuous batching is a HOST loop: finished slots release their blocks
  and the next queued request is prefilled into the freed slot while the
  other slots keep decoding — no recompilation (shapes are static).
- Prefill reuses the dense `mha_cached_forward` path on a (1, P) chunk (so
  every attention variant works at prefill), then scatters the dense prompt
  KV into pool blocks.
- GRPO groups share the prompt: the leader prefills once; siblings re-use
  its block-aligned prefix via refcounts (kv_cache.share_prefix) and copy
  only the unaligned tail block.

Decode attention supports MHA with GQA, qk-norm, partial rotary, sliding
window, GPT-OSS sinks and Qwen3-Next output gating, plus compressed-KV MLA.
Hybrid-GDN models (Qwen3.5 family) are paged too: full-attention sub-layers
ride the block pool while GatedDeltaNet sub-layers keep an O(1) per-SLOT
recurrent state (fast-weight S + conv rolling buffer) that prefill snapshots
for group prompt sharing. DSA models fall back to model/generate.py (the
dense engine) — `generate_auto` picks per config.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..module.attention import MHAConfig, apply_partial_rotary
from ..module.kv_cache import PagedKVCache, paged_write
from ..module.mlp import mlp_forward
from ..module.params import cast_tree
from ..module.rope import _rope_dim, rope_cos_sin
from ..ops.rms_norm import rms_norm
from .generate import (GenerateConfig, _filter_logits, _forward_cached,
                       _layer_cached, _layer_windows, _layer_windows_py,
                       _sample, _stacks,
                       init_cache)


def paged_eligible(model_cfg) -> bool:
    """MHA (incl. sinks/gate variants), MLA/DSA (compressed-KV paged decode,
    indexer-aware for DSA), or hybrid-GDN with MHA full layers (per-slot
    recurrent state). Every model family pages."""
    from ..module.mla import MLAConfig

    attn = model_cfg.attention
    if hasattr(model_cfg, "layer_types_pattern"):
        # GDN sub-layers carry per-slot recurrent state; the interleaved
        # full-attention sub-layers must be pageable MHA
        return isinstance(attn, MHAConfig)
    return isinstance(attn, (MHAConfig, MLAConfig))  # DSAConfig ⊂ MLAConfig



# ---------------------------------------------------------------- sampling
# Per-request sampling on ONE compiled program. The dense engine bakes
# sampling params into the jit (fine there: one batch, one config); the
# serving engine cannot afford a multi-minute remote recompile whenever a
# request changes temperature, so numeric params ride as traced per-slot
# rows and only COARSE CLASS BITS (greedy vs sampled, top-k/top-p in use,
# penalties in use, min_tokens in use) specialize the program — see
# PagedGenerator._sampling_class.

ROW_PARAM_DEFAULTS = {
    "temperature": 1.0, "top_p": 1.0, "top_k": 0,
    "repetition_penalty": 1.0, "presence_penalty": 0.0,
    "frequency_penalty": 0.0, "min_tokens": 0,
}


def _row_params(gen_cfg, reqs_or_none, b):
    """(B,)-array dict: per-request overrides falling back to gen_cfg."""
    out = {}
    for k, dflt in ROW_PARAM_DEFAULTS.items():
        base = getattr(gen_cfg, k, dflt)
        vals = []
        for r in (reqs_or_none or [None] * b):
            v = base if r is None else r.get(k, base)
            vals.append(v)
        dt = np.int32 if isinstance(dflt, int) else np.float32
        out[k] = np.asarray(vals, dt)
    return out


def _sample_rows(logits, rng, row, cls, gen_cfg, seen, counts, n_gen, eos):
    """Row-wise _sample: logits (B, V) f32 -> (B,) ids.

    row: dict of (B,) arrays (ROW_PARAM_DEFAULTS keys); cls: static class
    bits (do_sample, use_filter, use_pen, use_min). logit_bias stays
    compile-time (engine-keyed)."""
    if gen_cfg.logit_bias:
        ids = jnp.asarray(list(gen_cfg.logit_bias.keys()), jnp.int32)
        vals = jnp.asarray(list(gen_cfg.logit_bias.values()), logits.dtype)
        logits = logits.at[:, ids].add(vals)
    if cls["use_pen"]:
        rp = row["repetition_penalty"][:, None]
        pen = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen & (rp != 1.0), pen, logits)
        c = counts.astype(jnp.float32)
        logits = (logits
                  - row["presence_penalty"][:, None] * (c > 0)
                  - row["frequency_penalty"][:, None] * c)
    if cls["use_min"]:
        ids = [eos] + [t for t in gen_cfg.stop_token_ids if t != eos]
        blocked = jnp.zeros((logits.shape[-1],), bool)
        for t in ids:
            if t is not None:
                blocked = blocked.at[t].set(True)
        logits = jnp.where(
            blocked[None, :] & (n_gen[:, None] < row["min_tokens"][:, None]),
            -jnp.inf, logits)
    if not cls["do_sample"]:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(row["temperature"], 1e-6)[:, None]
    filt = logits / temp
    if cls["use_filter"]:
        srt = jnp.sort(filt, axis=-1)[:, ::-1]  # (B, V) descending
        v = filt.shape[-1]
        # traced top-k: rows with top_k<=0 keep everything
        k_idx = jnp.clip(jnp.where(row["top_k"] > 0, row["top_k"], v) - 1,
                         0, v - 1)
        kth = jnp.take_along_axis(srt, k_idx[:, None], axis=-1)
        filt = jnp.where(filt < kth, -jnp.inf, filt)
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < row["top_p"][:, None], axis=-1)
        cutoff = jnp.take_along_axis(srt, cutoff_idx[:, None], axis=-1)
        filt = jnp.where(filt < cutoff, -jnp.inf, filt)
    sampled = jax.random.categorical(rng, filt).astype(jnp.int32)
    # per-row greedy: temperature 0 rows argmax the UNSCALED logits
    return jnp.where(row["temperature"] <= 0.0, greedy, sampled)



# ------------------------------------------------------------------ layers

def _pool_gather(pool, layer, block_table):
    """Gather each sequence's blocks for one layer: (B, MB, BS, H, D).

    ONE gather over the leading (L, NB) dims: `pool[layer, block_table]`
    broadcasts the traced layer against the table, so XLA emits a single
    gather of (1, 1, BS, H, D) slices — neither a dynamic-slice of the whole
    (NB, BS, H, D) layer slab (~22% of step time at batch 64, round 3) nor
    the round-3 flat-reshape variant, whose reshape of the scan-carried pool
    materialized a FULL POOL COPY per layer (90% of step time, 5.7x decode
    regression — tools/profile_decode.py, round 4)."""
    return pool[layer, block_table]


def _mla_paged_attn(p, attn, h, cos, sin, pool_k, pool_v, layer, block_table,
                    seq_lens, rope_scaling=None):
    """Compressed-KV paged decode (the paged analog of mla_cached_forward,
    module/mla.py:100-170): pool_k holds the rank-`kv_lora_rank` latent,
    pool_v the shared rope key; the query is absorbed into latent space so
    attention contracts over rank per slot. DSA packs the per-token
    lightning-indexer key after the latent and narrows the valid set to the
    indexer's top-k (module/dsa.py:dsa_cached_forward)."""
    import jax

    from ..module.dsa import DSAConfig
    from ..module.mla import _deinterleave_rope, mla_softmax_scale
    from ..ops.rotary import apply_rotary_emb

    is_dsa = isinstance(attn, DSAConfig)
    b, c, _ = h.shape  # (B, C, H): C-token decode chunk (spec-verify uses C=2)
    nh, rank = attn.num_attention_heads, attn.kv_lora_rank
    dn, dr, dv = attn.qk_nope_head_dim, attn.qk_rope_head_dim, attn.v_head_dim
    h3 = h
    if attn.q_lora_rank is not None:
        q = h3 @ p["q_a_proj"]["w"]
        q = rms_norm(q, p["q_a_norm"], attn.rms_norm_eps)
        q = q @ p["q_b_proj"]["w"]
    else:
        q = h3 @ p["q_proj"]["w"]
    q = q.reshape(b, c, nh, attn.qk_head_dim)
    q_nope, q_rope = q[..., :dn], q[..., dn:]

    kv = h3 @ p["kv_a_proj"]["w"]
    kv_c, k_rope = kv[..., :rank], kv[..., rank:]
    kv_c = rms_norm(kv_c, p["kv_a_norm"], attn.rms_norm_eps)
    q_rope = _deinterleave_rope(q_rope)
    k_rope = _deinterleave_rope(k_rope[:, :, None, :])
    q_rope, k_rope = apply_rotary_emb(q_rope, k_rope, cos, sin)

    if is_dsa:
        kv_c = jnp.concatenate([kv_c, h3 @ p["idx_k_proj"]["w"]], axis=-1)
    for i in range(c):
        pool_k = paged_write(pool_k, layer, block_table, seq_lens + i,
                             kv_c[:, i, None, :])  # (B, 1, rank[+di])
        pool_v = paged_write(pool_v, layer, block_table, seq_lens + i,
                             k_rope[:, i])  # (B, 1, dr)

    wkb = p["kv_b_proj"]["w"].reshape(rank, nh, dn + dv)
    w_uk, w_uv = wkb[..., :dn], wkb[..., dn:]
    q_lat = jnp.einsum("bcnd,rnd->bcnr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))

    # pool dtype (bf16/int8) end-to-end; contractions accumulate f32 on the
    # MXU. int8 pools carry a packed f32 per-token scale (kv_cache.py
    # pack_kv_int8) that folds into logits/probs — it is positive, so it
    # even commutes with the DSA indexer's relu.
    lat = _pool_gather(pool_k, layer, block_table)  # (B, MB, BS, 1, rank[+di])
    rop = _pool_gather(pool_v, layer, block_table)
    quant = pool_k.dtype == jnp.int8
    b_, mb, bs = lat.shape[:3]
    lat = lat.reshape(b_, mb * bs, -1)
    rop = rop.reshape(b_, mb * bs, -1)
    lat_s = rop_s = None
    if quant:
        from ..module.kv_cache import KV_SCALE_BYTES

        nsb = KV_SCALE_BYTES
        lat, lat_s = lat[..., :-nsb], jax.lax.bitcast_convert_type(
            lat[..., -nsb:], jnp.float32)  # (B, S)
        rop, rop_s = rop[..., :-nsb], jax.lax.bitcast_convert_type(
            rop[..., -nsb:], jnp.float32)
    lat, idxk = lat[..., :rank], lat[..., rank:]
    cdt = h.dtype if quant else lat.dtype  # compute dtype when int8
    slot = jnp.arange(mb * bs)[None, None, :]
    qpos = seq_lens[:, None, None] + jnp.arange(c)[None, :, None]
    valid = slot <= qpos  # (B, C, S)
    if is_dsa:
        hi, di = attn.index_n_heads, attn.index_head_dim
        q_idx = (h3 @ p["idx_q_proj"]["w"]).reshape(b, c, hi, di).astype(cdt)
        w_idx = (h3 @ p["idx_w_proj"]["w"]).astype(jnp.float32)  # (B, C, Hi)
        inner = jnp.maximum(jnp.einsum("bchd,bsd->bchs", q_idx,
                                       idxk.astype(cdt),
                                       preferred_element_type=jnp.float32),
                            0.0)
        if quant:
            inner = inner * lat_s[:, None, None, :]
        isc = jnp.einsum("bchs,bch->bcs", inner, w_idx)
        isc = jnp.where(valid, isc, -jnp.inf)
        kk = min(attn.index_top_k, mb * bs)
        _, sel = jax.lax.top_k(isc, kk)  # (B, C, K)
        sel_mask = jnp.zeros((b, c, mb * bs), bool).at[
            jnp.arange(b)[:, None, None], jnp.arange(c)[None, :, None],
            sel].set(True)
        valid = valid & sel_mask
    scale = mla_softmax_scale(attn, rope_scaling)
    lg_lat = jnp.einsum("bcnr,bsr->bncs", q_lat.astype(cdt), lat.astype(cdt),
                        preferred_element_type=jnp.float32)
    lg_rop = jnp.einsum("bcnd,bsd->bncs", q_rope.astype(cdt), rop.astype(cdt),
                        preferred_element_type=jnp.float32)
    if quant:
        lg_lat = lg_lat * lat_s[:, None, None, :]
        lg_rop = lg_rop * rop_s[:, None, None, :]
    logits = (lg_lat + lg_rop) * scale
    logits = jnp.where(valid[:, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * lat_s[:, None, None, :] if quant else probs
    o_lat = jnp.einsum("bncs,bsr->bcnr", pv.astype(cdt), lat.astype(cdt),
                       preferred_element_type=jnp.float32)  # (B, C, nh, rank)
    o = jnp.einsum("bcnr,rnd->bcnd", o_lat, w_uv.astype(jnp.float32))
    o = o.reshape(b, c, nh * dv).astype(h.dtype)
    return o @ p["o_proj"]["w"], pool_k, pool_v


def _paged_layer_decode(lp, cfg, x, cos, sin, pool_k, pool_v, layer,
                        block_table, seq_lens, compute_dtype, window=None):
    """One decoder layer, C-token decode chunk against the paged pool.

    x: (B, C, H) — C=1 for plain decode, C=2 for MTP spec-verify; seq_lens:
    (B,) tokens already cached (chunk token i is written at seq_lens+i,
    attending slots <= seq_lens+i)."""
    from ..module.mla import MLAConfig

    lp = cast_tree(lp, compute_dtype)
    attn = cfg.attention
    b, c, _ = x.shape
    zc = cfg.rms_norm_type == "zero_centered"
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zc)

    if isinstance(attn, MLAConfig):
        o, pool_k, pool_v = _mla_paged_attn(
            lp["attn"], attn, h, cos, sin, pool_k, pool_v, layer, block_table,
            seq_lens, rope_scaling=cfg.rope_scaling_cfg)
        x = x + o
        h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zc)
        return _paged_mlp(lp, cfg, x, h, compute_dtype, pool_k, pool_v)

    from ..module.lora import lora_linear

    p = lp["attn"]
    gate = None
    if attn.with_gate:
        # q_proj emits (q ‖ gate) per head (attention.py:105-108); sigmoid
        # gate scales the attention output before o_proj
        qg = lora_linear(h, p["q_proj"], 1.0).reshape(
            b, c, attn.num_attention_heads, 2 * attn.head_dim)
        q, gate = qg[..., : attn.head_dim], qg[..., attn.head_dim:]
    else:
        q = lora_linear(h, p["q_proj"], 1.0).reshape(
            b, c, attn.num_attention_heads, attn.head_dim)
    k = lora_linear(h, p["k_proj"], 1.0).reshape(b, c, attn.num_key_value_heads,
                                                 attn.head_dim)
    v = lora_linear(h, p["v_proj"], 1.0).reshape(b, c, attn.num_key_value_heads,
                                                 attn.head_dim)
    if attn.qk_norm:
        q = rms_norm(q, p["q_norm"], attn.rms_norm_eps, zc)
        k = rms_norm(k, p["k_norm"], attn.rms_norm_eps, zc)
    q, k = apply_partial_rotary(q, k, cos, sin, attn.rope_dim)

    for i in range(c):
        pool_k = paged_write(pool_k, layer, block_table, seq_lens + i, k[:, i])
        pool_v = paged_write(pool_v, layer, block_table, seq_lens + i, v[:, i])

    from ..ops.attention.paged_decode import (paged_decode_attn,
                                              paged_decode_eligible)

    if (os.environ.get("XTUNER_PAGED_DECODE_KERNEL", "0") == "1"
            and paged_decode_eligible(pool_k, pool_v, attn.head_dim,
                                      pool_k.shape[2])):
        # Opt-in experiment, measured SLOWER than the gather path on v5e at
        # every bench shape (docs/kernels.md "Paged decode throughput"):
        # per-grid-step fixed cost dominates the tiny per-block compute, and
        # a paged block table defeats multi-block BlockSpec fetches.
        sinks = p["sinks"].astype(jnp.float32) if attn.with_sinks else None
        o = paged_decode_attn(q, pool_k, pool_v, layer, block_table,
                              seq_lens, scale=attn.head_dim ** -0.5,
                              window=window, sinks=sinks)
        o = o.reshape(b, c, -1).astype(compute_dtype)
        if gate is not None:
            o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
                o.dtype).reshape(b, c, -1)
        o = lora_linear(o, p["o_proj"], 1.0)
        x = x + o
        h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zc)
        return _paged_mlp(lp, cfg, x, h, compute_dtype, pool_k, pool_v)

    # gather-based paged attention; chunk token i sees slots <= seq_lens+i.
    # KV stays in pool dtype (bf16) end-to-end — logits/PV contract on the
    # MXU with f32 accumulation; the old path's f32 casts + 4x GQA
    # jnp.repeat materialized ~1.2 GB/layer of transients at batch 64
    # (docs/kernels.md "Paged decode throughput").
    kk = _pool_gather(pool_k, layer, block_table)  # (B, MB, BS, Hkv, D[+4])
    vv = _pool_gather(pool_v, layer, block_table)
    quant = pool_k.dtype == jnp.int8
    ks = vs = None
    if quant:
        # int8 cache: codes contract on the MXU; the positive per-(token,
        # head) scale folds into the logits (k) / probs (v) instead of ever
        # dequantizing K/V to bf16 in HBM (kv_cache.py pack_kv_int8)
        from ..module.kv_cache import unpack_kv_int8

        kk, ks = unpack_kv_int8(kk)  # (B, MB, BS, Hkv, D), (B, MB, BS, Hkv)
        vv, vs = unpack_kv_int8(vv)
    b_, mb, bs, hkv, d = kk.shape
    kk = kk.reshape(b_, mb * bs, hkv, d)
    vv = vv.reshape(b_, mb * bs, hkv, d)
    rep = attn.num_attention_heads // attn.num_key_value_heads
    scale = attn.head_dim ** -0.5
    cdt = q.dtype if quant else kk.dtype  # compute dtype when int8
    qg = q.reshape(b, c, hkv, rep, d).astype(cdt)
    logits = jnp.einsum("bcgrd,bsgd->bgrcs", qg, kk.astype(cdt),
                        preferred_element_type=jnp.float32) * scale
    if quant:
        ks = ks.reshape(b_, mb * bs, hkv).transpose(0, 2, 1)  # (B, G, S)
        vs = vs.reshape(b_, mb * bs, hkv).transpose(0, 2, 1)
        logits = logits * ks[:, :, None, None, :]
    logits = logits.reshape(b, hkv * rep, c, mb * bs)
    slot = jnp.arange(mb * bs)[None, None, :]
    qpos = seq_lens[:, None, None] + jnp.arange(c)[None, :, None]
    valid = slot <= qpos  # (B, C, S)
    if window is not None:
        # traced per-layer window (generate._layer_windows): 0 = full
        in_win = qpos - slot < window
        if not isinstance(window, int):
            in_win = in_win | (window <= 0)
        valid = valid & in_win
    logits = jnp.where(valid[:, None], logits, -1e30)  # (B, nh, C, S)
    if attn.with_sinks:
        # GPT-OSS sinks: a per-head learnable logit joins the softmax
        # denominator only (attention.py:201-206)
        sink = p["sinks"].astype(jnp.float32)[None, :, None, None]
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
        probs = jnp.exp(logits - m)
        probs = probs / (jnp.sum(probs, axis=-1, keepdims=True)
                         + jnp.exp(sink - m))
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    pg_ = probs.reshape(b, hkv, rep, c, mb * bs)
    if quant:
        pg_ = pg_ * vs[:, :, None, None, :]
    pg_ = pg_.astype(q.dtype if quant else vv.dtype)
    o = jnp.einsum("bgrcs,bsgd->bcgrd", pg_, vv.astype(pg_.dtype),
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, c, -1).astype(compute_dtype)
    if gate is not None:
        o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(o.dtype).reshape(
            b, c, -1)
    o = lora_linear(o, p["o_proj"], 1.0)

    x = x + o
    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zc)
    return _paged_mlp(lp, cfg, x, h, compute_dtype, pool_k, pool_v)


def _paged_mlp(lp, cfg, x, h, compute_dtype, pool_k, pool_v):
    """Shared decode-layer MLP/MoE tail; x, h: (B, C, H), h post-attn normed."""
    b, c, _ = x.shape
    routing = None
    if "experts" in lp:
        from ..module.moe_layer import moe_mlp_forward

        moe_out, r, _ = moe_mlp_forward(
            lp["experts"], lp["router"], cfg.router, h,
            num_experts=cfg.n_routed_experts, top_k=cfg.num_experts_per_tok,
            act=cfg.hidden_act, compute_dtype=compute_dtype)
        routing = r.topk_idx.reshape(b, c, -1)  # (B, C, K)
        if "shared_experts" in lp:
            shared = mlp_forward(lp["shared_experts"], h, cfg.hidden_act)
            if "shared_expert_gate" in lp:
                # Qwen3-Next sigmoid gate on the shared expert (hybrid.py:372-375)
                g = jax.nn.sigmoid((h @ lp["shared_expert_gate"]["w"]).astype(jnp.float32))
                shared = shared * g.astype(shared.dtype)
            moe_out = moe_out + shared
        h2 = moe_out
    else:
        h2 = mlp_forward(lp["mlp"], h, cfg.hidden_act)
    return x + h2, pool_k, pool_v, routing


def _paged_gdn_sublayer(lp, cfg, x, state, compute_dtype):
    """One hybrid GatedDeltaNet sub-layer at decode: per-slot recurrent
    state (S fast-weight, conv rolling buffer) instead of paged KV —
    the linear-attention decode win (no cache growth at all).

    x: (B, C, H) decode chunk; state: (S (B, Hv, dk, dv) f32,
    conv (B, K-1, ch)). Inactive slots update garbage state — harmless,
    prefill overwrites the slot on the next admit."""
    from ..module.gated_deltanet import gdn_cached_forward

    lp = cast_tree(lp, compute_dtype)
    zc = cfg.rms_norm_type == "zero_centered"
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zc)
    o, s_new, conv_new = gdn_cached_forward(
        lp["attn"], cfg.linear_attention, h, state[0], state[1])
    x = x + o
    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zc)
    x, _, _, routing = _paged_mlp(lp, cfg, x, h, compute_dtype, None, None)
    return x, (s_new, conv_new), routing


def speculative_accept(l0, draft_logits, draft, rng, gen_cfg):
    """(committed (B,), accept (B,) bool) — exact speculative acceptance.

    Greedy: accept iff the target model's argmax equals the draft. Sampling
    (Leviathan et al. / DeepSeek-V3 MTP decode): the draft was drawn from
    q = filtered(draft_logits); accept w.p. min(1, p(d)/q(d)) against
    p = filtered(l0), else resample from norm(max(p - q, 0)). Either way the
    committed token is distributed EXACTLY as p — speculation only changes
    how many steps decode takes, never what it samples."""
    import jax

    if not gen_cfg.do_sample or gen_cfg.temperature == 0.0:
        t = jnp.argmax(l0, axis=-1).astype(jnp.int32)
        return t, t == draft
    r1, r2 = jax.random.split(rng)
    p = jax.nn.softmax(_filter_logits(l0.astype(jnp.float32), gen_cfg), axis=-1)
    q = jax.nn.softmax(_filter_logits(draft_logits.astype(jnp.float32), gen_cfg),
                       axis=-1)
    pd = jnp.take_along_axis(p, draft[:, None], axis=1)[:, 0]
    qd = jnp.take_along_axis(q, draft[:, None], axis=1)[:, 0]
    accept = jax.random.uniform(r1, pd.shape) < jnp.minimum(
        pd / jnp.maximum(qd, 1e-30), 1.0)
    resid = jnp.maximum(p - q, 0.0)
    # residual is all-zero only when p <= q everywhere i.e. p == q: then the
    # accept probability is 1 and the resample branch is unreachable
    resid = jnp.where(jnp.sum(resid, axis=-1, keepdims=True) > 0, resid, p)
    resampled = jax.random.categorical(r2, jnp.log(resid + 1e-30)).astype(jnp.int32)
    return jnp.where(accept, draft, resampled), accept


# ------------------------------------------------------------------ engine
@dataclass
class _Slot:
    req: Optional[dict] = None
    seq_id: int = -1
    remaining: int = 0
    tokens: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)
    routings: list = field(default_factory=list)
    top_ids: list = field(default_factory=list)  # per-step top-K alt ids
    top_lps: list = field(default_factory=list)
    prefilling: bool = False  # chunked prefill in progress (not decodable)
    prefill_state: Optional[dict] = None
    done: bool = True  # free
    spec_steps: int = 0  # MTP verify steps taken / drafts accepted
    spec_accepted: int = 0


class PagedGenerator:
    """Continuous-batching rollout engine over a paged KV pool.

    requests: dicts {"prompt_ids": list[int], "max_new_tokens"?: int,
    "group"?: hashable} — same-`group` requests share prompt blocks.
    `generate(requests)` returns per-request dicts with generated token ids,
    logprobs, finish_reason (and routed_experts for MoE when asked).
    """

    def __init__(self, model, params, gen_cfg: GenerateConfig, *,
                 max_batch: int = 8, block_size: int = 128,
                 num_blocks: Optional[int] = None,
                 compute_dtype=jnp.bfloat16, pad_token_id: int = 0,
                 record_routing: bool = False, rng=None):
        cfg = model.cfg
        if not paged_eligible(cfg):
            raise ValueError("model config not eligible for the paged engine "
                             "(DSA) — use model.generate")
        self.model, self.params, self.gen_cfg = model, params, gen_cfg
        self.compute_dtype = compute_dtype
        self.pad_token_id = pad_token_id
        self.record_routing = record_routing
        self.max_batch = max_batch
        self.block_size = block_size
        max_len = gen_cfg.max_length
        self.max_blocks = -(-max_len // block_size)
        if num_blocks is None:
            num_blocks = self.max_blocks * max_batch + 1  # worst case, all unshared
        attn = cfg.attention
        self.is_hybrid = bool(getattr(cfg, "layer_types_pattern", None))
        self.gdn_state: dict = {}
        if self.is_hybrid:
            pattern = list(cfg.layer_types_pattern)
            self._n_periods = cfg.num_hidden_layers // len(pattern)
            # pool layer ranges: the i-th full-attention pattern slot owns
            # [base_i, base_i + n_periods); GDN slots own per-slot state
            self._full_base: dict[int, int] = {}
            base = 0
            la = cfg.linear_attention
            for i, kind in enumerate(pattern):
                if kind == "linear":
                    self.gdn_state[f"p{i}"] = (
                        jnp.zeros((self._n_periods, max_batch, la.num_v_heads,
                                   la.head_k_dim, la.head_v_dim), jnp.float32),
                        jnp.zeros((self._n_periods, max_batch,
                                   la.conv_kernel_size - 1, la.conv_channels),
                                  compute_dtype))
                else:
                    self._full_base[i] = base
                    base += self._n_periods
            n_layers_total = base
        else:
            stacks = _stacks(model, model.param_specs())
            n_layers_total = sum(
                jax.tree.leaves(s, is_leaf=lambda x: hasattr(x, "shape"))[0].shape[0]
                for _, s in stacks)
        self.speculative = bool(getattr(gen_cfg, "mtp_speculative", False))
        if self.speculative:
            from .generate import penalties_active

            if self.is_hybrid or getattr(cfg, "mtp_num_layers", 0) < 1:
                raise ValueError("mtp_speculative needs a non-hybrid model "
                                 "with mtp_num_layers >= 1")
            if record_routing:
                raise ValueError("mtp_speculative does not support "
                                 "record_routing (use plain paged decode)")
            if penalties_active(gen_cfg) or gen_cfg.min_tokens > 0 \
                    or gen_cfg.top_logprobs > 0:
                raise ValueError("mtp_speculative is incompatible with "
                                 "repetition penalties / min_tokens / "
                                 "top_logprobs")
            # the MTP layer's KV rides the same pool, one extra layer slot
            self._mtp_layer = n_layers_total
            n_layers_total += 1
            self._draft = np.zeros((max_batch,), np.int32)
            self._draft_logits = jnp.zeros((max_batch, cfg.vocab_size),
                                           jnp.float32)
            self._spec_fn = None
        from ..module.mla import MLAConfig

        from ..module.dsa import DSAConfig

        kv_dtype = (jnp.int8 if gen_cfg.kv_cache_dtype == "int8"
                    else compute_dtype)
        if isinstance(attn, MLAConfig):
            # compressed MLA cache: latent pool + shared-rope-key pool
            # (mirrors model/generate.init_cache's MLA branch); DSA packs
            # the indexer key into the latent pool
            extra = attn.index_head_dim if isinstance(attn, DSAConfig) else 0
            self.cache = PagedKVCache(n_layers_total, num_blocks, block_size,
                                      1, attn.kv_lora_rank + extra,
                                      dtype=kv_dtype,
                                      head_dim_v=attn.qk_rope_head_dim)
        else:
            self.cache = PagedKVCache(n_layers_total, num_blocks, block_size,
                                      attn.num_key_value_heads, attn.head_dim,
                                      dtype=kv_dtype)
        # block 0 is the TRASH block: inactive decode slots have all-zero
        # block tables, so their (masked-out) writes land here instead of a
        # live sequence's block; never handed out by the allocator
        self.cache.allocator.refcount[0] = 1
        self.slots = [_Slot() for _ in range(max_batch)]
        # sampling-state features (dense-engine parity, generate.py:340-391):
        # penalties keep device-resident (B, V) seen/count state updated
        # in-step; min_tokens feeds per-slot generated-counts; top_logprobs
        # returns per-step top-K alternatives
        from .generate import penalties_active

        # coarse sampling CLASS BITS specialize the compiled program;
        # numeric values ride as per-slot traced rows (_sample_rows) so a
        # request changing temperature/top_p/penalty strengths never
        # recompiles (remote compiles cost minutes on the tunnel)
        self.cls = {
            "do_sample": bool(gen_cfg.do_sample and gen_cfg.temperature != 0.0),
            "use_filter": gen_cfg.top_k > 0 or gen_cfg.top_p < 1.0,
            "use_pen": penalties_active(gen_cfg),
            "use_min": gen_cfg.min_tokens > 0,
        }
        self.penalized = self.cls["use_pen"]
        self.use_min = self.cls["use_min"]
        self.top_k_lp = int(gen_cfg.top_logprobs)
        # chunked prefill: one CP-token chunk per tick keeps in-flight
        # decodes ticking while long prompts load (vLLM chunked-prefill
        # analog); chunk programs are per-bucket jits reused across chunks
        # via traced cache_len
        cp = int(getattr(gen_cfg, "prefill_chunk", 0) or 0)
        self.prefill_chunk = -(-cp // self.PREFILL_BUCKET) * \
            self.PREFILL_BUCKET if cp > 0 else 0
        self.chunked = (self.prefill_chunk > 0 and not self.is_hybrid
                        and not getattr(gen_cfg, "mtp_speculative", False)
                        and not record_routing)
        self._chunk_fns: dict = {}
        self._scatter_fns: dict = {}
        self._chunked_prefills = 0  # observability/testing counter
        if self.penalized:
            v = cfg.vocab_size
            self._seen = jnp.zeros((max_batch, v), bool)
            self._counts = jnp.zeros((max_batch, v), jnp.int32)
        self._next_seq = 0
        self._rng = rng if rng is not None else jax.random.key(0)
        self._prefill_fns: dict[int, Any] = {}
        self._decode_fn = None
        self._group_leader: dict[Any, int] = {}  # group -> seq_id of leader
        # automatic prefix caching (module/prefix_cache.py): finished
        # sequences retain their block-aligned KV under content hashes; a
        # new prompt sharing that prefix skips its prefill FLOPs (vLLM APC /
        # SGLang radix-cache analog — multi-turn chats re-use the previous
        # turn's KV). Hybrid-GDN carries unpaged recurrent state, MTP-spec
        # KV encodes sampled tokens, and routing-replay wants prompt
        # routings — those modes keep APC off.
        self.prefix_cache = None
        if (getattr(gen_cfg, "prefix_cache", True) and not self.is_hybrid
                and not self.speculative and not record_routing
                and not isinstance(attn, DSAConfig)):
            from ..module.prefix_cache import PrefixCache

            self.prefix_cache = PrefixCache(self.cache.allocator, block_size)
        self._flush_requested = False  # set cross-thread on weight updates
        self._gather_fns: dict = {}

    # ---------------- jitted programs ----------------
    def _make_trunk(self, record: bool):
        """trunk(params, pool_k, pool_v, gdn_state, x, cos, sin, seq_lens,
        block_table) -> (x, pool_k, pool_v, gdn_state, rout) over all layer
        stacks; x: (B, C, H) decode chunk."""
        model, cfg, dtype = self.model, self.model.cfg, self.compute_dtype

        # The scan-carried pools are read only via _pool_gather (flat index
        # arithmetic, no per-layer slab dynamic-slice) and written only via
        # paged_write scatters, so XLA keeps the donated carry in place.
        # Fully UNROLLING the layer loop (static indices) is available via
        # XTUNER_PAGED_UNROLL_MAX but compiles pathologically over the
        # remote tunnel (>12 min for 12 layers vs ~1 min scan) — default 0.
        unroll_max = int(os.environ.get("XTUNER_PAGED_UNROLL_MAX", 0))

        def trunk_dense(params, pool_k, pool_v, gdn_state, x, cos, sin,
                        seq_lens, block_table):
            layer0 = 0
            routings = []
            for name, stack in _stacks(model, params):
                has_moe = isinstance(stack, dict) and "experts" in stack
                n = jax.tree.leaves(
                    stack, is_leaf=lambda a: hasattr(a, "shape"))[0].shape[0]
                if n <= unroll_max:
                    wins = _layer_windows_py(cfg, name, n)
                    ys_list = []
                    for i in range(n):
                        lp = jax.tree.map(lambda a, _i=i: a[_i], stack)
                        w = wins[i]
                        x, pool_k, pool_v, routing = _paged_layer_decode(
                            lp, cfg, x, cos, sin, pool_k, pool_v, layer0 + i,
                            block_table, seq_lens, dtype,
                            w if w > 0 else None)
                        if record and has_moe:
                            ys_list.append(routing)
                    layer0 += n
                    if record and has_moe:
                        routings.append(jnp.stack(ys_list, 0))  # (nL, B, C, K)
                    continue

                windows = _layer_windows(cfg, name, n)

                def body(carry, xs, _moe=has_moe):
                    lp, win = xs
                    x, pk, pv, li = carry
                    x, pk, pv, routing = _paged_layer_decode(
                        lp, cfg, x, cos, sin, pk, pv, li, block_table, seq_lens,
                        dtype, win)
                    ys = routing if (record and _moe) else jnp.int32(0)
                    return (x, pk, pv, li + 1), ys

                (x, pool_k, pool_v, layer0), ys = jax.lax.scan(
                    body, (x, pool_k, pool_v, layer0), (stack, windows))
                if record and has_moe:
                    routings.append(ys)  # (nL, B, C, K)
            rout = (jnp.transpose(jnp.concatenate(routings, axis=0)[:, :, -1],
                                  (1, 0, 2))
                    if routings else jnp.zeros((x.shape[0], 0, 0), jnp.int32))
            return x, pool_k, pool_v, gdn_state, rout

        def trunk_hybrid(params, pool_k, pool_v, gdn_state, x, cos, sin,
                         seq_lens, block_table):
            pattern = list(cfg.layer_types_pattern)
            full_base = self._full_base
            window = cfg.sliding_window if cfg.use_sliding_window else None
            has_moe = hasattr(cfg, "n_routed_experts")

            def sublayers(x, pk, pv, lp_tuple, states, j):
                new_states, routs = {}, []
                for i, kind in enumerate(pattern):
                    lp = lp_tuple[f"p{i}"]
                    if kind == "linear":
                        x, new_states[f"p{i}"], r = _paged_gdn_sublayer(
                            lp, cfg, x, states[f"p{i}"], dtype)
                    else:
                        x, pk, pv, r = _paged_layer_decode(
                            lp, cfg, x, cos, sin, pk, pv, full_base[i] + j,
                            block_table, seq_lens, dtype, window)
                    routs.append(r)
                return x, pk, pv, new_states, routs

            n_periods = self._n_periods
            if n_periods * len(pattern) <= unroll_max:
                # unrolled (see trunk_dense note): static pool slab indices
                ns_list, ys_list = [], []
                for j in range(n_periods):
                    lp_tuple = jax.tree.map(lambda a, _j=j: a[_j],
                                            params["pattern"])
                    states = jax.tree.map(lambda a, _j=j: a[_j], gdn_state)
                    x, pool_k, pool_v, new_states, routs = sublayers(
                        x, pool_k, pool_v, lp_tuple, states, j)
                    ns_list.append(new_states)
                    if record and has_moe:
                        ys_list.append(jnp.stack(routs, 0))
                gdn_state = jax.tree.map(lambda *a: jnp.stack(a, 0), *ns_list)
                ys = (jnp.stack(ys_list, 0) if (record and has_moe)
                      else jnp.int32(0))
            else:
                def body(carry, xs):
                    x, pk, pv = carry
                    lp_tuple, states, j = xs
                    x, pk, pv, new_states, routs = sublayers(
                        x, pk, pv, lp_tuple, states, j)
                    ys_r = (jnp.stack(routs, 0) if (record and has_moe)
                            else jnp.int32(0))
                    return (x, pk, pv), (new_states, ys_r)

                (x, pool_k, pool_v), (gdn_state, ys) = jax.lax.scan(
                    body, (x, pool_k, pool_v),
                    (params["pattern"], gdn_state, jnp.arange(n_periods)))
            if record and has_moe:
                # (n_periods, period, B, C, K) -> (B, n_periods*period, K) at
                # the last chunk pos; HF layer order = period_idx*period + pos
                ys = ys[:, :, :, -1]
                rout = jnp.transpose(ys, (2, 0, 1, 3)).reshape(
                    x.shape[0], -1, ys.shape[-1])
            else:
                rout = jnp.zeros((x.shape[0], 0, 0), jnp.int32)
            return x, pool_k, pool_v, gdn_state, rout

        return trunk_hybrid if self.is_hybrid else trunk_dense

    def _decode(self):
        if self._decode_fn is not None:
            return self._decode_fn
        model, cfg, dtype = self.model, self.model.cfg, self.compute_dtype
        gen_cfg = self.gen_cfg
        trunk = self._make_trunk(self.record_routing)

        use_pen, use_min, k_lp = self.penalized, self.use_min, self.top_k_lp
        eos = self.eos_id

        def step(params, pool_k, pool_v, gdn_state, tok, seq_lens, block_table,
                 active, rng, seen, counts, n_gen, row):
            x = jnp.take(params["embed"]["w"], tok[:, None], axis=0).astype(dtype)
            cos, sin = rope_cos_sin(seq_lens[:, None], _rope_dim(cfg.attention),
                                    cfg.rope_theta, cfg.rope_scaling_cfg,
                                    cfg.max_position_embeddings)
            x, pool_k, pool_v, gdn_state, rout = trunk(
                params, pool_k, pool_v, gdn_state, x, cos, sin, seq_lens,
                block_table)
            x = rms_norm(x, params["final_norm"].astype(jnp.float32),
                         cfg.rms_norm_eps, cfg.rms_norm_type == "zero_centered")[:, -1]
            logits = jnp.dot(x.astype(dtype), model.lm_head_weight(params).astype(dtype),
                             preferred_element_type=jnp.float32)
            if use_pen:
                # dense-parity update order (generate.py:375-379): the fed
                # token joins seen/counts BEFORE sampling its successor
                rows = jnp.arange(tok.shape[0])
                counts = counts.at[rows, tok].add(active.astype(jnp.int32))
                seen = seen | (jnp.zeros_like(seen).at[rows, tok].set(True)
                               & active[:, None])
            new_tok = _sample_rows(logits, rng, row, self.cls, gen_cfg,
                                   seen, counts, n_gen, eos)
            lps_full = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(lps_full, new_tok[:, None], axis=-1)[:, 0]
            top = (jax.lax.top_k(lps_full, k_lp) if k_lp > 0
                   else (jnp.zeros((tok.shape[0], 0), jnp.float32),
                         jnp.zeros((tok.shape[0], 0), jnp.int32)))
            new_tok = jnp.where(active, new_tok, self.pad_token_id)
            new_lens = jnp.where(active, seq_lens + 1, seq_lens)
            return (new_tok, lp, new_lens, pool_k, pool_v, gdn_state, rout,
                    seen, counts, top[0], top[1])

        self._decode_fn = jax.jit(step, donate_argnums=(1, 2, 3, 9, 10))
        return self._decode_fn

    def _spec_decode(self):
        """One MTP draft-verify step: feed [last_committed, draft] as a C=2
        trunk chunk, accept/reject the draft against the target distribution
        (exact — speculative_accept), commit 1-2 tokens, and draft the next
        token with the MTP layer (its KV rides pool layer self._mtp_layer).

        Reference: DeepSeek-V3 MTP speculative decoding (the reference
        framework delegates this to its serving engines; here it is native)."""
        if self._spec_fn is not None:
            return self._spec_fn
        model, cfg, dtype = self.model, self.model.cfg, self.compute_dtype
        gen_cfg = self.gen_cfg
        trunk = self._make_trunk(record=False)
        mtp_layer = self._mtp_layer
        pad_id = self.pad_token_id

        from ..module.mtp import mtp_fuse

        def step(params, pool_k, pool_v, tok, draft, draft_logits, seq_lens,
                 block_table, active, rng):
            chunk = jnp.stack([tok, draft], axis=1)  # (B, 2)
            x = jnp.take(params["embed"]["w"], chunk, axis=0).astype(dtype)
            pos = seq_lens[:, None] + jnp.arange(2)[None, :]
            cos, sin = rope_cos_sin(pos, _rope_dim(cfg.attention),
                                    cfg.rope_theta, cfg.rope_scaling_cfg,
                                    cfg.max_position_embeddings)
            x, pool_k, pool_v, _, _ = trunk(params, pool_k, pool_v, {}, x,
                                            cos, sin, seq_lens, block_table)
            zc = cfg.rms_norm_type == "zero_centered"
            fnorm = params["final_norm"].astype(jnp.float32)
            w_head = model.lm_head_weight(params).astype(dtype)
            hn = rms_norm(x, fnorm, cfg.rms_norm_eps, zc)
            logits = jnp.dot(hn.astype(dtype), w_head,
                             preferred_element_type=jnp.float32)  # (B, 2, V)
            l0, l1 = logits[:, 0], logits[:, 1]
            r1, r2, r3 = jax.random.split(rng, 3)
            committed1, accept = speculative_accept(l0, draft_logits, draft,
                                                    r1, gen_cfg)
            committed2 = _sample(l1, r2, gen_cfg)  # the "bonus" token from p
            lp1 = jnp.take_along_axis(jax.nn.log_softmax(l0, axis=-1),
                                      committed1[:, None], axis=1)[:, 0]
            lp2 = jnp.take_along_axis(jax.nn.log_softmax(l1, axis=-1),
                                      committed2[:, None], axis=1)[:, 0]

            # ---- MTP drafting for the NEXT position ----
            mtp_lp = jax.tree.map(lambda a: a[0], params["mtp_layers"])
            emb = jnp.take(params["embed"]["w"],
                           jnp.stack([committed1, committed2], axis=1),
                           axis=0).astype(dtype)
            extras = cast_tree({k: mtp_lp[k] for k in
                                ("proj", "hidden_norm", "embed_norm")}, dtype)
            fused = mtp_fuse(extras, x, emb, cfg.rms_norm_eps)
            # on reject, fused[:, 1] is garbage: its MTP output is unused for
            # those rows and its pool write at seq_lens+1 is overwritten by
            # the next step (seq_lens rolls back to +1)
            g, pool_k, pool_v, _ = _paged_layer_decode(
                mtp_lp, cfg, fused, cos, sin, pool_k, pool_v, mtp_layer,
                block_table, seq_lens, dtype)
            gn = rms_norm(g, fnorm, cfg.rms_norm_eps, zc)
            mtp_logits = jnp.dot(gn.astype(dtype), w_head,
                                 preferred_element_type=jnp.float32)
            nd_logits = jnp.where(accept[:, None], mtp_logits[:, 1],
                                  mtp_logits[:, 0])
            new_draft = _sample(nd_logits, r3, gen_cfg)

            n_commit = jnp.where(accept, 2, 1)
            committed1 = jnp.where(active, committed1, pad_id)
            committed2 = jnp.where(active & accept, committed2, pad_id)
            new_lens = jnp.where(active, seq_lens + n_commit, seq_lens)
            return (committed1, committed2, accept, lp1, lp2, new_draft,
                    nd_logits, new_lens, pool_k, pool_v)

        self._spec_fn = jax.jit(step, donate_argnums=(1, 2))
        return self._spec_fn

    PREFILL_BUCKET = 64

    def _prefill(self, p_bucket: int):
        """Dense prefill over a (1, P_bucket) right-padded chunk reusing the
        training-grade cached path, then scatter the prompt KV into pool
        blocks. Compiled once per P bucket (64-token granularity); the real
        prompt length arrives as a traced `last_idx`/`n_blocks_live` pair, so
        variable prompts share one program. Right-pad garbage KV lands past
        seq_len — decode's valid mask never attends it and the first decoded
        tokens overwrite it in place."""
        if p_bucket in self._prefill_fns:
            return self._prefill_fns[p_bucket]
        model, cfg, dtype = self.model, self.model.cfg, self.compute_dtype
        gen_cfg = self.gen_cfg
        bs = self.block_size
        n_blocks = -(-p_bucket // bs)

        def _pack_blocks(c, pad):
            n = c.shape[0]
            cp = jnp.pad(c[:, 0], ((0, 0), (0, pad), (0, 0), (0, 0)))
            return cp.reshape(n, n_blocks, bs, *c.shape[3:])

        def run(params, pool_k, pool_v, gdn_state, slot, prompt, positions,
                kv_mask, block_table, last_idx, rng, row):
            pad = n_blocks * bs - p_bucket
            snap: dict = {}
            if self.is_hybrid:
                caches = model.init_decode_cache(1, p_bucket, dtype)
                logits, new_caches, routing = model.forward_cached(
                    params, prompt, positions, caches, jnp.int32(0), dtype,
                    kv_mask, n_valid=(last_idx + 1)[None])
                gdn_state = dict(gdn_state)
                for i, kind in enumerate(cfg.layer_types_pattern):
                    c = new_caches[f"p{i}"]
                    if kind == "linear":
                        # post-PROMPT recurrent state: written at this slot
                        # and snapshotted for group prompt sharing
                        snap[f"p{i}"] = c
                        s_all, conv_all = gdn_state[f"p{i}"]
                        gdn_state[f"p{i}"] = (
                            s_all.at[:, slot].set(c[0][:, 0]),
                            conv_all.at[:, slot].set(
                                c[1][:, 0].astype(conv_all.dtype)))
                    else:
                        base = self._full_base[i]
                        pool_k = _scatter_blocks(pool_k, base,
                                                 block_table[:n_blocks],
                                                 _pack_blocks(c[0], pad))
                        pool_v = _scatter_blocks(pool_v, base,
                                                 block_table[:n_blocks],
                                                 _pack_blocks(c[1], pad))
            else:
                caches = init_cache(model, 1, p_bucket, dtype)
                h_tr = None
                if self.speculative:
                    logits, caches, routing, h_tr = _forward_cached(
                        model, params, prompt, positions, caches, jnp.int32(0),
                        dtype, kv_mask, self.record_routing, with_hidden=True)
                else:
                    logits, caches, routing = _forward_cached(
                        model, params, prompt, positions, caches, jnp.int32(0),
                        dtype, kv_mask, self.record_routing)
                # scatter dense (L, 1, P, H, D) prompt KV into the pool's blocks
                # (k/v dims handled separately: MLA pools differ — latent vs rope)
                li = 0
                for ck, cv in caches:
                    pool_k = _scatter_blocks(pool_k, li, block_table[:n_blocks],
                                             _pack_blocks(ck, pad))
                    pool_v = _scatter_blocks(pool_v, li, block_table[:n_blocks],
                                             _pack_blocks(cv, pad))
                    li += ck.shape[0]
            r_tok, r_draft = jax.random.split(rng)
            last = jnp.take(logits, last_idx[None], axis=1)[:, 0]
            if self.penalized:
                v = cfg.vocab_size
                seen0 = (jnp.zeros((1, v), jnp.float32).at[
                    jnp.zeros_like(prompt), prompt].add(
                        kv_mask.astype(jnp.float32)) > 0)
                counts0 = jnp.zeros((1, v), jnp.int32)
            else:
                seen0 = jnp.zeros((1, 0), bool)
                counts0 = jnp.zeros((1, 0), jnp.int32)
            tok = _sample_rows(last, r_tok, row, self.cls, gen_cfg, seen0,
                               counts0, jnp.zeros((1,), jnp.int32),
                               self.eos_id)
            lp = jax.nn.log_softmax(last, axis=-1)
            lp = jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]
            rout = (jnp.take(routing, last_idx[None], axis=1)[:, 0]
                    if routing is not None else jnp.zeros((1, 0, 0), jnp.int32))
            if not self.speculative:
                return tok, lp, pool_k, pool_v, gdn_state, snap, rout, last

            # ---- MTP prefill: fuse trunk hidden with NEXT-token embeddings
            # (the last real position's next token is the freshly sampled
            # one), run the MTP layer over the bucket, page its KV, draft ----
            from ..module.mtp import mtp_fuse

            mtp_lp = jax.tree.map(lambda a: a[0], params["mtp_layers"])
            nxt = jnp.concatenate([prompt[:, 1:], prompt[:, :1] * 0], axis=1)
            nxt = nxt.at[0, last_idx].set(tok[0])
            emb_n = jnp.take(params["embed"]["w"], nxt, axis=0).astype(dtype)
            extras = cast_tree({k: mtp_lp[k] for k in
                                ("proj", "hidden_norm", "embed_norm")}, dtype)
            fused = mtp_fuse(extras, h_tr, emb_n, cfg.rms_norm_eps)
            cos, sin = rope_cos_sin(positions, _rope_dim(cfg.attention),
                                    cfg.rope_theta, cfg.rope_scaling_cfg,
                                    cfg.max_position_embeddings)
            mtp_caches = init_cache(model, 1, p_bucket, dtype)
            mk, mv = jax.tree.map(lambda a: a[0], mtp_caches[0])
            g, mk, mv, _ = _layer_cached(model, mtp_lp, cfg, fused, cos, sin,
                                         mk, mv, jnp.int32(0), dtype, kv_mask)
            pool_k = _scatter_blocks(pool_k, self._mtp_layer,
                                     block_table[:n_blocks],
                                     _pack_blocks(mk[None], pad))
            pool_v = _scatter_blocks(pool_v, self._mtp_layer,
                                     block_table[:n_blocks],
                                     _pack_blocks(mv[None], pad))
            g_last = jnp.take(g, last_idx[None], axis=1)
            gn = rms_norm(g_last, params["final_norm"].astype(jnp.float32),
                          cfg.rms_norm_eps,
                          cfg.rms_norm_type == "zero_centered")
            d_logits = jnp.dot(gn.astype(dtype),
                               model.lm_head_weight(params).astype(dtype),
                               preferred_element_type=jnp.float32)[:, 0]
            draft = _sample(d_logits, r_draft, gen_cfg)
            return (tok, lp, pool_k, pool_v, gdn_state, snap, rout, last,
                    draft, d_logits)

        fn = jax.jit(run, donate_argnums=(1, 2, 3))
        self._prefill_fns[p_bucket] = fn
        return fn

    # ---------------- host driver ----------------
    def _chunk_fn(self, bucket: int, cp: int):
        """(params, caches, ids (1, CP), positions, cache_len, kv_mask) ->
        (last-chunk logits (1, CP, V), caches). One program per bucket —
        cache_len is traced, so every chunk of every prompt in the bucket
        reuses it."""
        key = (bucket, cp)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        model, dtype = self.model, self.compute_dtype

        def run(params, caches, ids, positions, cache_len, kv_mask):
            logits, caches, _ = _forward_cached(
                model, params, ids, positions, caches, cache_len, dtype,
                kv_mask)
            return logits, caches

        fn = jax.jit(run, donate_argnums=(1,))
        self._chunk_fns[key] = fn
        return fn

    def _scatter_fn(self, bucket: int):
        """(pool_k, pool_v, caches, block_table (n_blocks,)) -> pools with
        the dense prefill caches paged in."""
        if bucket in self._scatter_fns:
            return self._scatter_fns[bucket]
        bs = self.block_size
        n_blocks = -(-bucket // bs)

        def run(pool_k, pool_v, caches, block_table):
            pad = n_blocks * bs - bucket

            def pack(c):
                n = c.shape[0]
                cp_ = jnp.pad(c[:, 0], ((0, 0), (0, pad), (0, 0), (0, 0)))
                return cp_.reshape(n, n_blocks, bs, *c.shape[3:])

            li = 0
            for ck, cv in caches:
                pool_k = _scatter_blocks(pool_k, li, block_table, pack(ck))
                pool_v = _scatter_blocks(pool_v, li, block_table, pack(cv))
                li += ck.shape[0]
            return pool_k, pool_v

        fn = jax.jit(run, donate_argnums=(0, 1))
        self._scatter_fns[bucket] = fn
        return fn

    def _gather_fn(self, bucket: int):
        """(pool_k, pool_v, block_table (n_blocks,)) -> dense prefill caches
        shaped like init_cache(model, 1, bucket): the inverse of _scatter_fn.
        Restores a prefix-cache hit's KV so chunked prefill can resume at
        the cached offset (garbage in the not-yet-written tail blocks is
        masked off by the chunk programs' causal cache_len masking, exactly
        like the zeros of a fresh dense cache)."""
        if bucket in self._gather_fns:
            return self._gather_fns[bucket]
        bs = self.block_size
        n_blocks = -(-bucket // bs)
        model, dtype = self.model, self.compute_dtype

        def run(pool_k, pool_v, block_table):
            def restore(pool, li, n):
                g = pool[li + jnp.arange(n)[:, None], block_table[None, :]]
                if pool.dtype == jnp.int8:
                    from ..module.kv_cache import unpack_kv_int8

                    q, s = unpack_kv_int8(g)
                    g = q.astype(jnp.float32) * s[..., None]
                g = g.reshape(n, n_blocks * bs, *g.shape[3:])
                return g[:, None, :bucket].astype(dtype)

            out, li = [], 0
            for zk, _zv in init_cache(model, 1, bucket, dtype):
                n = zk.shape[0]
                out.append((restore(pool_k, li, n), restore(pool_v, li, n)))
                li += n
            return out

        fn = jax.jit(run)
        self._gather_fns[bucket] = fn
        return fn

    def _advance_prefill(self, slot_idx: int) -> None:
        """Process ONE prefill chunk for a chunk-prefilling slot; on the
        final chunk, scatter the prompt KV to the pool, sample the first
        token, and promote the slot to decoding."""
        slot = self.slots[slot_idx]
        st = slot.prefill_state
        cp, bucket = st.get("cp") or self.prefill_chunk, st["bucket"]
        p_len = st["p_len"]
        # Clamp the chunk start so its cache write stays inside the bucket:
        # dynamic_update_slice CLAMPS an out-of-range start, which would
        # silently shift the write over earlier prefix positions (latent
        # corruption whenever cp does not divide the bucket, and for any
        # prefix-cache resume at an arbitrary offset). A clamped chunk
        # recomputes its overlap with the previous one — identical tokens at
        # identical positions produce identical KV, so the rewrite is a no-op.
        off = max(0, min(st["offset"], bucket - cp))
        ids = np.full((cp,), self.pad_token_id, np.int32)
        real = min(cp, p_len - off)
        ids[:real] = st["prompt"][off:off + real]
        positions = jnp.minimum(off + jnp.arange(cp, dtype=jnp.int32),
                                p_len - 1)[None]
        kv_mask = (jnp.arange(bucket) < p_len)[None]
        logits, st["caches"] = self._chunk_fn(bucket, cp)(
            self.params, st["caches"], jnp.asarray(ids[None]), positions,
            jnp.int32(off), kv_mask)
        st["offset"] = off + cp
        self._chunked_prefills += 1
        if st["offset"] < p_len:
            return
        # ---- final chunk: page the KV, sample token 1, promote ----
        table = st["table"]
        n_blocks = -(-bucket // self.block_size)
        self.cache.pool_k, self.cache.pool_v = self._scatter_fn(bucket)(
            self.cache.pool_k, self.cache.pool_v, st["caches"],
            jnp.asarray(table[:n_blocks]))
        last = logits[:, p_len - 1 - off]  # (1, V)
        req = slot.req
        self._rng, r = jax.random.split(self._rng)
        if self.penalized:
            v = self.model.cfg.vocab_size
            seen0 = jnp.zeros((1, v), bool).at[
                0, jnp.asarray(st["prompt"], jnp.int32)].set(True)
            counts0 = jnp.zeros((1, v), jnp.int32)
        else:
            seen0 = jnp.zeros((1, 0), bool)
            counts0 = jnp.zeros((1, 0), jnp.int32)
        row1 = _row_params(self.gen_cfg, [req], 1)
        tok_a = _sample_rows(last, r, row1, self.cls, self.gen_cfg, seen0,
                             counts0, jnp.zeros((1,), jnp.int32),
                             self.eos_id)
        lp_a = jax.nn.log_softmax(last, axis=-1)
        lp_a = jnp.take_along_axis(lp_a, tok_a[:, None], axis=-1)[:, 0]
        slot.tokens = [int(tok_a[0])]
        slot.logprobs = [float(lp_a[0])]
        slot.top_ids, slot.top_lps = [], []
        if self.top_k_lp > 0:
            tv, ti = jax.lax.top_k(jax.nn.log_softmax(last, axis=-1),
                                   self.top_k_lp)
            slot.top_ids = [np.asarray(ti[0])]
            slot.top_lps = [np.asarray(tv[0])]
        if self.penalized:
            v = self.model.cfg.vocab_size
            srow = jnp.zeros((v,), bool).at[
                jnp.asarray(st["prompt"], jnp.int32)].set(True)
            self._seen = self._seen.at[slot_idx].set(srow)
            self._counts = self._counts.at[slot_idx].set(
                jnp.zeros((v,), jnp.int32))
        group = req.get("group")
        if group is not None:
            # leadership registers only now: siblings admitted earlier
            # prefilled themselves; later ones share the finished prompt
            self._group_leader[group] = (slot.seq_id, last, None, {})
        slot.remaining -= 1  # the sampled first token
        slot.prefilling = False
        slot.prefill_state = None

    def _admit(self, slot_idx: int, req: dict) -> None:
        """Prefill one request into a free slot (prefix-shared if its group
        leader already cached the prompt)."""
        prompt = [t for t in req["prompt_ids"]]
        p_len = len(prompt)
        budget = int(req.get("max_new_tokens", self.gen_cfg.max_new_tokens))
        if p_len + budget > self.max_blocks * self.block_size:
            raise ValueError(
                f"request needs {p_len + budget} tokens > max_length "
                f"{self.max_blocks * self.block_size}; raise gen_cfg.max_length")
        seq_id = self._next_seq
        self._next_seq += 1
        group = req.get("group")
        slot = self.slots[slot_idx]

        leader = self._group_leader.get(group) if group is not None else None
        if self.speculative:
            # the leader's last-position MTP KV encodes ITS first sampled
            # token; a sibling's differs, so spec mode prefills every request
            leader = None
        shared = (leader is not None and leader[0] in self.cache.tables
                  and self.cache.seq_lens[leader[0]] == p_len)
        if shared:
            leader_seq, leader_logits, leader_rout, leader_snap = leader
            # share the block-aligned prefix, copy the ragged tail block
            self.cache.share_prefix(leader_seq, seq_id)
            aligned = self.cache.seq_lens[seq_id]
            if aligned < p_len:
                self.cache.extend(seq_id, p_len - aligned)
                src_blk = self.cache.tables[leader_seq][aligned // self.block_size]
                dst_blk = self.cache.tables[seq_id][aligned // self.block_size]
                self.cache.pool_k = self.cache.pool_k.at[:, dst_blk].set(
                    self.cache.pool_k[:, src_blk])
                self.cache.pool_v = self.cache.pool_v.at[:, dst_blk].set(
                    self.cache.pool_v[:, src_blk])
                self.cache.seq_lens[seq_id] = p_len
            if self.is_hybrid and leader_snap:
                # GDN state isn't paged: copy the leader's post-prompt
                # recurrent snapshot into this slot
                self.gdn_state = jax.tree.map(
                    lambda a, s: a.at[:, slot_idx].set(s[:, 0].astype(a.dtype)),
                    self.gdn_state, leader_snap)
            # sibling samples its OWN first token from the leader's cached
            # last-position logits (no re-prefill)
            self._rng, r = jax.random.split(self._rng)
            if self.penalized:
                v = self.model.cfg.vocab_size
                seen0 = jnp.zeros((1, v), bool).at[
                    0, jnp.asarray(prompt, jnp.int32)].set(True)
                counts0 = jnp.zeros((1, v), jnp.int32)
            else:
                seen0 = jnp.zeros((1, 0), bool)
                counts0 = jnp.zeros((1, 0), jnp.int32)
            row1 = _row_params(self.gen_cfg, [req], 1)
            tok_a = _sample_rows(leader_logits, r, row1, self.cls,
                                 self.gen_cfg, seen0, counts0,
                                 jnp.zeros((1,), jnp.int32), self.eos_id)
            lp_a = jax.nn.log_softmax(leader_logits, axis=-1)
            lp_a = jnp.take_along_axis(lp_a, tok_a[:, None], axis=-1)[:, 0]
            tok, lp = int(tok_a[0]), float(lp_a[0])
            rout = leader_rout
        else:
            pb = -(-p_len // self.PREFILL_BUCKET) * self.PREFILL_BUCKET
            cached, hit = 0, []
            if self.prefix_cache is not None:
                # content-addressed reuse: longest cached block-chain prefix
                # (capped at p_len-1 so at least one tail token is left to
                # produce last-position logits)
                hit = self.prefix_cache.lookup(prompt, p_len - 1)
                cached = len(hit) * self.block_size
            if cached:
                # adopt the shared prefix blocks (lookup took our refs),
                # allocate tail blocks for the bucket, restore the dense
                # prefix KV from the pool, and resume chunked prefill at
                # offset `cached` — prefix FLOPs are skipped entirely
                self.cache.tables[seq_id] = hit
                self.cache.seq_lens[seq_id] = cached
                self.cache.extend(seq_id, pb - cached)
                self.cache.seq_lens[seq_id] = p_len
                table = np.zeros((self.max_blocks,), np.int32)
                ids = self.cache.tables[seq_id]
                table[:len(ids)] = ids
                if self.chunked and p_len - cached > self.prefill_chunk:
                    cp = self.prefill_chunk  # keep anti-HOL-blocking ticks
                else:
                    # single-tick resume: pow2-of-64 tail ladder keeps the
                    # compiled (bucket, cp) program set small
                    cp = 64
                    while cp < min(pb, p_len - cached):
                        cp *= 2
                    cp = min(cp, pb)
                n_blocks = -(-pb // self.block_size)
                caches = self._gather_fn(pb)(
                    self.cache.pool_k, self.cache.pool_v,
                    jnp.asarray(table[:n_blocks]))
                slot.req = req
                slot.seq_id = seq_id
                slot.remaining = int(req.get("max_new_tokens",
                                             self.gen_cfg.max_new_tokens))
                slot.tokens, slot.logprobs = [], []
                slot.routings, slot.top_ids, slot.top_lps = [], [], []
                slot.spec_steps = slot.spec_accepted = 0
                slot.prefilling = True
                slot.prefill_state = {
                    "caches": caches, "offset": cached, "p_len": p_len,
                    "bucket": pb, "prompt": list(prompt), "table": table,
                    "cp": cp,
                }
                slot.done = False
                return
            # reserve blocks for the BUCKET (right-pad garbage is overwritten
            # by the first decoded tokens and never attended), then trim the
            # book-kept length back to the true prompt length
            self.cache.add_sequence(seq_id, pb)
            self.cache.seq_lens[seq_id] = p_len
            table = np.zeros((self.max_blocks,), np.int32)
            ids = self.cache.tables[seq_id]
            table[:len(ids)] = ids
            if self.chunked and p_len > self.prefill_chunk:
                # initiate resumable chunked prefill: the engine tick
                # advances one chunk at a time (_advance_prefill) so live
                # slots keep decoding under this prompt's load
                slot.req = req
                slot.seq_id = seq_id
                slot.remaining = int(req.get("max_new_tokens",
                                             self.gen_cfg.max_new_tokens))
                slot.tokens, slot.logprobs = [], []
                slot.routings, slot.top_ids, slot.top_lps = [], [], []
                slot.spec_steps = slot.spec_accepted = 0
                slot.prefilling = True
                slot.prefill_state = {
                    "caches": init_cache(self.model, 1, pb,
                                         self.compute_dtype),
                    "offset": 0, "p_len": p_len, "bucket": pb,
                    "prompt": list(prompt), "table": table,
                }
                slot.done = False
                return
            padded = np.full((pb,), self.pad_token_id, np.int32)
            padded[:p_len] = prompt
            prompt_arr = jnp.asarray(padded[None])
            positions = jnp.minimum(jnp.arange(pb, dtype=jnp.int32), p_len - 1)[None]
            kv_mask = (jnp.arange(pb) < p_len)[None]
            self._rng, r = jax.random.split(self._rng)
            # spec mode ignores per-request overrides: the verify step's
            # accept/reject distribution is compiled from gen_cfg
            row1 = _row_params(self.gen_cfg,
                               None if self.speculative else [req], 1)
            if self.speculative:
                (tok_a, lp_a, self.cache.pool_k, self.cache.pool_v,
                 self.gdn_state, snap, rout, last, draft_a, d_logits) = \
                    self._prefill(pb)(
                        self.params, self.cache.pool_k, self.cache.pool_v,
                        self.gdn_state, jnp.int32(slot_idx), prompt_arr,
                        positions, kv_mask, jnp.asarray(table),
                        jnp.int32(p_len - 1), r, row1)
                self._draft[slot_idx] = int(np.asarray(draft_a)[0])
                self._draft_logits = self._draft_logits.at[slot_idx].set(
                    d_logits[0])
            else:
                (tok_a, lp_a, self.cache.pool_k, self.cache.pool_v,
                 self.gdn_state, snap, rout, last) = self._prefill(pb)(
                    self.params, self.cache.pool_k, self.cache.pool_v,
                    self.gdn_state, jnp.int32(slot_idx), prompt_arr,
                    positions, kv_mask, jnp.asarray(table),
                    jnp.int32(p_len - 1), r, row1)
            tok, lp = int(tok_a[0]), float(lp_a[0])
            rout = np.asarray(rout[0]) if rout.size else None
            if group is not None:
                self._group_leader[group] = (seq_id, last, rout, snap)
        slot.req = req
        slot.seq_id = seq_id
        slot.remaining = int(req.get("max_new_tokens", self.gen_cfg.max_new_tokens))
        slot.tokens = [tok]
        slot.logprobs = [lp]
        slot.routings = [rout] if (rout is not None and self.record_routing) else []
        slot.top_ids, slot.top_lps = [], []
        if self.top_k_lp > 0:
            row = leader_logits if shared else last  # (1, V) last-pos logits
            tv, ti = jax.lax.top_k(jax.nn.log_softmax(row, axis=-1),
                                   self.top_k_lp)
            slot.top_ids = [np.asarray(ti[0])]
            slot.top_lps = [np.asarray(tv[0])]
        if self.penalized:
            # reset this slot's device-resident penalty state: prompt tokens
            # are "seen"; generated counts start at zero (the first decode
            # step folds the first sampled token in, generate.py parity)
            v = self.model.cfg.vocab_size
            srow = jnp.zeros((v,), bool).at[
                jnp.asarray(prompt, jnp.int32)].set(True)
            self._seen = self._seen.at[slot_idx].set(srow)
            self._counts = self._counts.at[slot_idx].set(
                jnp.zeros((v,), jnp.int32))
        slot.spec_steps = slot.spec_accepted = 0
        slot.done = False
        slot.remaining -= 1

    def _finish(self, slot: _Slot, reason: str) -> dict:
        req = slot.req
        out = {
            "request": req,
            "token_ids": slot.tokens,
            "logprobs": slot.logprobs,
            "finish_reason": reason,
        }
        if self.record_routing and slot.routings:
            out["routed_experts"] = np.stack(slot.routings)  # (N, nL, K)
        if slot.top_ids:
            out["top_logprob_ids"] = np.stack(slot.top_ids)  # (N, K)
            out["top_logprobs"] = np.stack(slot.top_lps)
        if self.speculative:
            out["spec_steps"] = slot.spec_steps
            out["spec_accepted"] = slot.spec_accepted
        if self.prefix_cache is not None and req is not None:
            # retain this sequence's written KV (prompt + generated) under
            # content hashes — the next turn of a multi-turn conversation
            # prompts with exactly this prefix
            written = self.cache.seq_lens[slot.seq_id]
            toks = (list(req["prompt_ids"]) + slot.tokens)[:written]
            self.prefix_cache.insert(toks, self.cache.tables[slot.seq_id])
        self.cache.release(slot.seq_id)
        group = (req or {}).get("group")
        leader = self._group_leader.get(group) if group is not None else None
        if leader is not None and leader[0] == slot.seq_id:
            del self._group_leader[group]
        slot.req, slot.done, slot.seq_id = None, True, -1
        return out

    @property
    def eos_id(self) -> int:
        return (self.gen_cfg.eos_token_id
                if self.gen_cfg.eos_token_id is not None
                else self.model.cfg.eos_token_id)

    def has_live_slots(self) -> bool:
        return any(not s.done for s in self.slots)

    def request_prefix_flush(self) -> None:
        """Invalidate the prefix cache (weight update: cached KV is stale).
        Safe from any thread; applied at the next tick on the engine
        thread."""
        self._flush_requested = True

    def check_block_conservation(self) -> None:
        """Pool-wide conservation invariant (the vLLM block-manager
        analog): every reference the allocator holds is owned by exactly
        one of (a) the reserved trash block 0, (b) a live sequence's block
        table, (c) one prefix-cache entry. A surplus means leaked blocks;
        a deficit means a double-free (masked by release()'s clamp-at-0).
        Cheap host numpy — called at the end of every batch generate()."""
        tables = sum(len(t) for t in self.cache.tables.values())
        cached = len(self.prefix_cache) if self.prefix_cache is not None else 0
        held = 1 + tables + cached
        total = int(self.cache.allocator.refcount.sum())
        if total != held:
            raise AssertionError(
                f"paged-pool block conservation violated: allocator holds "
                f"{total} refs but owners account for {held} "
                f"(trash=1, live tables={tables}, prefix cache={cached})")

    def generate(self, requests: list[dict]) -> list[dict]:
        """Run all requests to completion with continuous batching; returns
        outputs in request order."""
        queue = [dict(r, _idx=i) for i, r in enumerate(requests)]
        results: dict[int, dict] = {}
        while queue or self.has_live_slots():
            self.tick(queue, results)
        self.check_block_conservation()
        return [results[i] for i in range(len(requests))]

    def tick(self, queue: list[dict], results: dict[int, dict]) -> None:
        """One continuous-batching round: admit queued requests into free
        slots, harvest finished slots into `results` (keyed by the request's
        `_idx`), run ONE decode step over the live slots. The sync
        `generate` loops this to exhaustion; `model/async_engine.py` loops
        it forever against a concurrently-fed queue."""
        if self._flush_requested:
            # drained on the engine thread — the only thread that may touch
            # allocator/table state (set via request_prefix_flush)
            if self.prefix_cache is not None:
                self.prefix_cache.flush()
            self._flush_requested = False
        eos = self.eos_id
        # admission: fill every free slot (leader-first within a group so
        # siblings can share its prompt blocks)
        for i, s in enumerate(self.slots):
            if s.done and queue:
                self._admit(i, queue.pop(0))
        pre = [i for i, s in enumerate(self.slots) if s.prefilling]
        if pre:  # round-robin across prefilling slots (no starvation)
            self._advance_prefill(pre[self._chunked_prefills % len(pre)])
        active_idx = [i for i, s in enumerate(self.slots)
                      if not s.done and not s.prefilling]
        # finish slots that hit eos at admission or ran out of budget
        for i in list(active_idx):
            s = self.slots[i]
            if s.tokens and (s.tokens[-1] == eos
                             or s.tokens[-1] in self.gen_cfg.stop_token_ids):
                ridx = s.req["_idx"]
                results[ridx] = self._finish(s, "stop")
            elif s.tokens and any(
                    len(s.tokens) >= len(seq) and s.tokens[-len(seq):] == seq
                    for seq in s.req.get("_stop_seqs", ())):
                # multi-token stop sequences (worker maps OpenAI `stop`
                # strings to id sequences); token-level match — the worker
                # additionally truncates the decoded text
                ridx = s.req["_idx"]
                results[ridx] = self._finish(s, "stop")
            elif s.remaining <= 0:
                ridx = s.req["_idx"]
                results[ridx] = self._finish(s, "length")
        active_idx = [i for i, s in enumerate(self.slots)
                      if not s.done and not s.prefilling]
        if not active_idx:
            return
        if self.speculative:
            self._spec_step(active_idx, eos)
            return
        step_fn = self._decode()

        b = self.max_batch
        tok = np.full((b,), self.pad_token_id, np.int32)
        lens = np.zeros((b,), np.int32)
        table = np.zeros((b, self.max_blocks), np.int32)
        active = np.zeros((b,), bool)
        for i in active_idx:
            s = self.slots[i]
            tok[i] = s.tokens[-1]
            lens[i] = self.cache.seq_lens[s.seq_id]
            ids = self.cache.tables[s.seq_id]
            table[i, :len(ids)] = ids
            active[i] = True
            # allocate room for the token this step will write
            self.cache.extend(s.seq_id, 1)
            ids = self.cache.tables[s.seq_id]
            table[i, :len(ids)] = ids

        n_gen = np.zeros((b,), np.int32)
        for i in active_idx:
            n_gen[i] = len(self.slots[i].tokens)
        if self.penalized:
            seen, counts = self._seen, self._counts
        else:
            seen = jnp.zeros((b, 0), bool)
            counts = jnp.zeros((b, 0), jnp.int32)
        row = _row_params(self.gen_cfg,
                          [s.req for s in self.slots], b)
        self._rng, r = jax.random.split(self._rng)
        (new_tok, lp, new_lens, self.cache.pool_k, self.cache.pool_v,
         self.gdn_state, rout, seen, counts, top_lp, top_ids) = step_fn(
            self.params, self.cache.pool_k, self.cache.pool_v,
            self.gdn_state, jnp.asarray(tok), jnp.asarray(lens),
            jnp.asarray(table), jnp.asarray(active), r, seen, counts,
            jnp.asarray(n_gen), row)
        if self.penalized:
            self._seen, self._counts = seen, counts
        new_tok = np.asarray(new_tok)
        lp = np.asarray(lp)
        rout = np.asarray(rout)
        if self.top_k_lp > 0:
            top_lp, top_ids = np.asarray(top_lp), np.asarray(top_ids)
        for i in active_idx:
            s = self.slots[i]
            s.tokens.append(int(new_tok[i]))
            s.logprobs.append(float(lp[i]))
            if self.top_k_lp > 0:
                s.top_ids.append(top_ids[i])
                s.top_lps.append(top_lp[i])
            if self.record_routing and rout.size:
                s.routings.append(rout[i])
            s.remaining -= 1


    def _spec_step(self, active_idx: list[int], eos: int) -> None:
        """One MTP draft-verify step over the live slots: commits 1 token on
        reject, 2 on accept. The jit extends every active sequence by
        n_commit; host bookkeeping reserves 2 slots up front and rolls the
        length back to what was actually committed (the over-reserved block,
        if any, stays allocated for the next step — release frees it)."""
        b = self.max_batch
        tok = np.full((b,), self.pad_token_id, np.int32)
        lens = np.zeros((b,), np.int32)
        table = np.zeros((b, self.max_blocks), np.int32)
        active = np.zeros((b,), bool)
        for i in active_idx:
            s = self.slots[i]
            tok[i] = s.tokens[-1]
            lens[i] = self.cache.seq_lens[s.seq_id]
            self.cache.extend(s.seq_id, 2)  # room for both chunk writes
            ids = self.cache.tables[s.seq_id]
            table[i, :len(ids)] = ids
            active[i] = True
        self._rng, r = jax.random.split(self._rng)
        (c1, c2, acc, lp1, lp2, new_draft, nd_logits, _new_lens,
         self.cache.pool_k, self.cache.pool_v) = self._spec_decode()(
            self.params, self.cache.pool_k, self.cache.pool_v,
            jnp.asarray(tok), jnp.asarray(self._draft), self._draft_logits,
            jnp.asarray(lens), jnp.asarray(table), jnp.asarray(active), r)
        c1, c2, acc = np.asarray(c1), np.asarray(c2), np.asarray(acc)
        lp1, lp2 = np.asarray(lp1), np.asarray(lp2)
        self._draft = np.array(new_draft)  # copy: np view of a jax array is read-only
        self._draft_logits = nd_logits
        for i in active_idx:
            s = self.slots[i]
            s.spec_steps += 1
            s.tokens.append(int(c1[i]))
            s.logprobs.append(float(lp1[i]))
            s.remaining -= 1
            committed = 1
            if bool(acc[i]):
                s.spec_accepted += 1
                # the bonus token only counts if the slot is still going
                # (not eos, budget left) — a discarded bonus means the slot
                # finishes this round, so its cache is about to be released
                if s.tokens[-1] != eos and s.remaining > 0:
                    s.tokens.append(int(c2[i]))
                    s.logprobs.append(float(lp2[i]))
                    s.remaining -= 1
                    committed = 2
            self.cache.seq_lens[s.seq_id] = int(lens[i]) + committed


def _scatter_blocks(pool, layer0: int, block_table, values):
    """values: (n_layers, MB, BS, H, D) -> pool[layer0+l, block_table[m]].
    An int8 (quantized) pool packs values via pack_kv_int8 first."""
    if pool.dtype == jnp.int8 and values.dtype != jnp.int8:
        from ..module.kv_cache import pack_kv_int8

        values = pack_kv_int8(values)
    n = values.shape[0]
    layers = layer0 + jnp.arange(n)[:, None]
    blocks = jnp.broadcast_to(block_table[None, :], (n, block_table.shape[0]))
    return pool.at[layers, blocks].set(values)
