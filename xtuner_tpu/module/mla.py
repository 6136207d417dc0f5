"""Multi-Latent Attention (DeepSeek V2/V3).

Reference: xtuner/v1/module/attention/mla.py (MultiLatentAttention, 678 LoC):
LoRA-style low-rank q and kv projections, rope/nope head-dim split with the
rope part of k shared across heads, yarn mscale on the softmax scale. For
training we materialize per-head q/k/v and reuse the flash varlen kernel
(v_head_dim may differ from qk head dim); the compressed-KV decode path is a
round-2 item.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from ..ops.attention import attention
from ..ops.rms_norm import rms_norm
from ..ops.rotary import apply_rotary_emb
from ..parallel.sharding import ShardCtx
from .params import ParamSpec
from .rope import RopeScalingConfig


class MLAConfig(BaseModel):
    """Mirrors the reference MLAConfig surface."""

    model_config = ConfigDict(extra="forbid")
    num_attention_heads: int
    q_lora_rank: Optional[int] = None  # None = full-rank q projection
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rms_norm_eps: float = 1e-6

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    # compat with MHAConfig consumers
    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.qk_rope_head_dim  # rope is applied over this dim

    def q_dim(self) -> int:
        return self.num_attention_heads * self.qk_head_dim

    qk_norm: bool = False
    with_sinks: bool = False
    qkv_bias: bool = False
    o_bias: bool = False
    sliding_window: Optional[int] = None


def mla_param_specs(cfg: MLAConfig, hidden_size: int, init_scale: float = 0.02) -> dict:
    h = hidden_size
    nh = cfg.num_attention_heads
    specs: dict = {}
    if cfg.q_lora_rank is not None:
        specs["q_a_proj"] = {"w": ParamSpec((h, cfg.q_lora_rank), ("embed_shard", None), scale=init_scale)}
        specs["q_a_norm"] = ParamSpec((cfg.q_lora_rank,), (None,), init="ones")
        specs["q_b_proj"] = {"w": ParamSpec((cfg.q_lora_rank, nh * cfg.qk_head_dim),
                                            (None, "heads"), scale=init_scale)}
    else:
        specs["q_proj"] = {"w": ParamSpec((h, nh * cfg.qk_head_dim), ("embed_shard", "heads"),
                                          scale=init_scale)}
    specs["kv_a_proj"] = {"w": ParamSpec((h, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
                                         ("embed_shard", None), scale=init_scale)}
    specs["kv_a_norm"] = ParamSpec((cfg.kv_lora_rank,), (None,), init="ones")
    specs["kv_b_proj"] = {"w": ParamSpec(
        (cfg.kv_lora_rank, nh * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
        (None, "heads"), scale=init_scale)}
    specs["o_proj"] = {"w": ParamSpec((nh * cfg.v_head_dim, h), ("heads", "embed_shard"),
                                      scale=init_scale)}
    return specs


def mla_softmax_scale(cfg: MLAConfig, rope_scaling: Optional[RopeScalingConfig]) -> float:
    scale = cfg.qk_head_dim ** -0.5
    if rope_scaling is not None and rope_scaling.rope_type == "yarn" and rope_scaling.mscale_all_dim:
        m = 0.1 * rope_scaling.mscale_all_dim * math.log(rope_scaling.factor) + 1.0
        scale = scale * m * m
    return scale


def _deinterleave_rope(t):
    """(..., d) interleaved pairs (x0,y0,x1,y1,...) -> half-split (x..., y...)."""
    *lead, d = t.shape
    return t.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


def mla_cached_forward(p: dict, cfg: MLAConfig, x, cos, sin, cache_c, cache_r,
                       cache_len, rope_scaling: Optional[RopeScalingConfig] = None,
                       kv_mask=None):
    """Compressed-KV (latent) incremental attention for generation.

    Reference: mla.py:83-123 flash_mla_with_kvcache — the cache stores ONLY
    the rank-`kv_lora_rank` latent + the shared rope key (576 dims for
    DeepSeek V3 vs nh*(dn+dv)=32k materialized), and the query is ABSORBED
    into latent space through the k-half of kv_b_proj, so decode attention
    contracts over kv_lora_rank instead of per-head keys:

      q_lat = q_nope @ W_uk          (B, C, nh, rank)
      logit = q_lat·cache_c + q_rope·cache_rope
      out   = (softmax @ cache_c) @ W_uv

    x: (B, C, H); cache_c: (B, S, 1, rank); cache_r: (B, S, 1, rope_dim).
    Exactly the materialized-path math by associativity (fp32 softmax).
    """
    b, c, _ = x.shape
    nh, rank = cfg.num_attention_heads, cfg.kv_lora_rank
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
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

    cache_c = jax.lax.dynamic_update_slice(
        cache_c, kv_c[:, :, None, :].astype(cache_c.dtype), (0, cache_len, 0, 0))
    cache_r = jax.lax.dynamic_update_slice(
        cache_r, k_rope.astype(cache_r.dtype), (0, cache_len, 0, 0))

    # absorbed projections from the k/v halves of kv_b_proj
    wkb = p["kv_b_proj"]["w"].reshape(rank, nh, dn + dv)
    w_uk, w_uv = wkb[..., :dn], wkb[..., dn:]
    q_lat = jnp.einsum("bcnd,rnd->bcnr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))

    scale = mla_softmax_scale(cfg, rope_scaling)
    lat = cache_c[:, :, 0].astype(jnp.float32)  # (B, S, rank)
    rop = cache_r[:, :, 0].astype(jnp.float32)  # (B, S, dr)
    logits = (jnp.einsum("bcnr,bsr->bncs", q_lat, lat)
              + jnp.einsum("bcnd,bsd->bncs", q_rope.astype(jnp.float32), rop)) * scale
    kpos = jnp.arange(s_max)[None, :]
    qpos = cache_len + jnp.arange(c)[:, None]
    mask = (kpos <= qpos)[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out_lat = jnp.einsum("bncs,bsr->bcnr", probs, lat)
    o = jnp.einsum("bcnr,rnd->bcnd", out_lat, w_uv.astype(jnp.float32)).astype(x.dtype)
    o = o.reshape(b, c, nh * dv)
    return o @ p["o_proj"]["w"], cache_c, cache_r


def mla_forward(p: dict, cfg: MLAConfig, x, cos, sin, segment_ids, sc: ShardCtx,
                rope_scaling: Optional[RopeScalingConfig] = None,
                attn_impl: Optional[str] = None, window=None, lora_scaling: float = 1.0):
    """x: (B, L, H) -> (B, L, H). cos/sin computed for qk_rope_head_dim."""
    b, l, _ = x.shape
    nh = cfg.num_attention_heads

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

    # rope on the rope split; k_rope is shared across heads (reference MLA).
    # DeepSeek HF checkpoints store the rope dims INTERLEAVED (x0,y0,x1,y1,...):
    # de-interleave to half-split layout before rotate_half rope, matching
    # reference mla.py:158-161 (view(d//2, 2).transpose) — without this, HF
    # imports silently compute wrong attention.
    k_rope = k_rope[:, :, None, :]  # (B, L, 1, rope_dim)
    q_rope = _deinterleave_rope(q_rope)
    k_rope = _deinterleave_rope(k_rope)
    q_rope, k_rope = apply_rotary_emb(q_rope, k_rope, cos, sin)
    k_rope = jnp.broadcast_to(k_rope, (b, l, nh, cfg.qk_rope_head_dim))

    q_full = jnp.concatenate([q_nope, q_rope], axis=-1)
    k_full = jnp.concatenate([k_nope, k_rope], axis=-1)

    scale = mla_softmax_scale(cfg, rope_scaling)
    o = attention(q_full, k_full, v, segment_ids, causal=True, scale=scale,
                  impl=attn_impl, sc=sc)
    o = sc(o, "batch", "seq", None, None)
    o = o.reshape(b, l, nh * cfg.v_head_dim)
    return o @ p["o_proj"]["w"]
