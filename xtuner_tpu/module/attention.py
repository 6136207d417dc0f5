"""Multi-head (GQA) attention module.

Reference: xtuner/v1/module/attention/mha.py (MultiHeadAttention, 475 LoC):
GQA with qk-norm, optional output gate and GPT-OSS sinks, with Ulysses SP
inlined as explicit all_to_alls. Here the module is a pure function; Ulysses
is two sharding-constraint flips (seq-sharded -> head-sharded and back) that
GSPMD lowers to ICI all_to_all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import attention
from ..ops.rms_norm import rms_norm
from ..ops.rotary import apply_rotary_emb
from ..parallel.sharding import ShardCtx
from .lora import LoraConfig, add_lora_specs, lora_linear
from .params import ParamSpec


class MHAConfig(BaseModel):
    """Mirrors the reference MHAConfig surface (module/attention/mha.py)."""

    model_config = ConfigDict(extra="forbid")
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    qk_norm: bool = False
    qkv_bias: bool = False
    o_bias: bool = False
    sliding_window: Optional[int] = None  # applied per-layer by the model
    with_sinks: bool = False
    rms_norm_eps: float = 1e-6
    rms_norm_type: str = "default"  # default | zero_centered (qk-norm flavor)
    # Qwen3-Next gated attention (reference mha.py:45,342-346,430-432):
    # q_proj emits (q ‖ gate) per head; sigmoid(gate) scales the attention
    # output before o_proj
    with_gate: bool = False
    # rotary on only the first `rope_dim` dims of each head (Qwen3.5: 0.25)
    partial_rotary_factor: float = 1.0

    @property
    def rope_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    # dims of the projections
    def q_dim(self) -> int:
        return self.num_attention_heads * self.head_dim

    def kv_dim(self) -> int:
        return self.num_key_value_heads * self.head_dim


def mha_param_specs(cfg: MHAConfig, hidden_size: int, init_scale: float = 0.02,
                    lora: Optional[LoraConfig] = None) -> dict:
    q_out = cfg.q_dim() * (2 if cfg.with_gate else 1)
    specs: dict = {
        "q_proj": {"w": ParamSpec((hidden_size, q_out), ("embed_shard", "heads"), scale=init_scale)},
        "k_proj": {"w": ParamSpec((hidden_size, cfg.kv_dim()), ("embed_shard", "kv_heads"), scale=init_scale)},
        "v_proj": {"w": ParamSpec((hidden_size, cfg.kv_dim()), ("embed_shard", "kv_heads"), scale=init_scale)},
        "o_proj": {"w": ParamSpec((cfg.q_dim(), hidden_size), ("heads", "embed_shard"), scale=init_scale)},
    }
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        add_lora_specs(specs[name], name, specs[name]["w"], lora)
    if cfg.qkv_bias:
        specs["q_proj"]["b"] = ParamSpec((cfg.q_dim(),), ("heads",), init="zeros")
        specs["k_proj"]["b"] = ParamSpec((cfg.kv_dim(),), ("kv_heads",), init="zeros")
        specs["v_proj"]["b"] = ParamSpec((cfg.kv_dim(),), ("kv_heads",), init="zeros")
    if cfg.o_bias:
        specs["o_proj"]["b"] = ParamSpec((hidden_size,), (None,), init="zeros")
    if cfg.qk_norm:
        specs["q_norm"] = ParamSpec((cfg.head_dim,), (None,), init="ones")
        specs["k_norm"] = ParamSpec((cfg.head_dim,), (None,), init="ones")
    if cfg.with_sinks:
        specs["sinks"] = ParamSpec((cfg.num_attention_heads,), ("heads",), init="zeros")
    return specs


def apply_partial_rotary(q, k, cos, sin, rope_dim: int):
    """Rotate only the first `rope_dim` dims of each head (partial rotary,
    Qwen3.5 factor 0.25); cos/sin are (B, L, rope_dim)."""
    if rope_dim == q.shape[-1]:
        return apply_rotary_emb(q, k, cos, sin)
    q_rot, k_rot = apply_rotary_emb(q[..., :rope_dim], k[..., :rope_dim], cos, sin)
    q = jnp.concatenate([q_rot, q[..., rope_dim:]], axis=-1)
    k = jnp.concatenate([k_rot, k[..., rope_dim:]], axis=-1)
    return q, k


def mha_forward(p: dict, cfg: MHAConfig, x, cos, sin, segment_ids,
                sc: ShardCtx, window: Optional[int] = None, attn_impl: Optional[str] = None,
                lora_scaling: float = 1.0, fp8_cfg=None):
    """x: (B, L, hidden) -> (B, L, hidden)."""
    def _linear(x, p):
        return lora_linear(x, p, lora_scaling, fp8_cfg)

    b, l, _ = x.shape
    gate = None
    if cfg.with_gate:
        qg = _linear(x, p["q_proj"]).reshape(b, l, cfg.num_attention_heads, 2 * cfg.head_dim)
        q, gate = qg[..., : cfg.head_dim], qg[..., cfg.head_dim:]
    else:
        q = _linear(x, p["q_proj"]).reshape(b, l, cfg.num_attention_heads, cfg.head_dim)
    k = _linear(x, p["k_proj"]).reshape(b, l, cfg.num_key_value_heads, cfg.head_dim)
    v = _linear(x, p["v_proj"]).reshape(b, l, cfg.num_key_value_heads, cfg.head_dim)

    max_logit = None
    if cfg.qk_norm:
        zc = cfg.rms_norm_type == "zero_centered"
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, zc)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, zc)
        # provable |scaled logit| bound: normed rows have ||x|| = sqrt(d), so
        # |q·k|/sqrt(d) <= sqrt(d) * max|g_q| * max|g_k| (Cauchy-Schwarz);
        # rope is a per-pair rotation and preserves norms. Enables the
        # max-free flash forward (no online-softmax max tracking).
        gq = p["q_norm"].astype(jnp.float32)
        gk = p["k_norm"].astype(jnp.float32)
        if zc:
            gq, gk = 1.0 + gq, 1.0 + gk
        max_logit = (cfg.head_dim ** 0.5) * jnp.max(jnp.abs(gq)) * jnp.max(jnp.abs(gk))

    q, k = apply_partial_rotary(q, k, cos, sin, cfg.rope_dim)

    sinks = p["sinks"] if cfg.with_sinks else None
    # Ulysses handled inside `attention`: Pallas impls run under shard_map
    # (heads over sp/tp, seq gathered); jnp impls re-shard via constraints.
    if attn_impl in (None, "pallas"):
        o = attention(q, k, v, segment_ids, causal=True, window=window, sinks=sinks,
                      max_logit=max_logit, impl=attn_impl, sc=sc)
    else:
        q = sc(q, "batch", None, "act_heads", None)
        k = sc(k, "batch", None, "act_heads", None)
        v = sc(v, "batch", None, "act_heads", None)
        o = attention(q, k, v, segment_ids, causal=True, window=window, sinks=sinks,
                      impl=attn_impl)
    o = sc(o, "batch", "seq", None, None)
    o = checkpoint_name(o, "attn_out")
    o = o.reshape(b, l, cfg.q_dim())
    if gate is not None:
        o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(o.dtype).reshape(
            b, l, cfg.q_dim())
    return _linear(o, p["o_proj"])


def mha_cached_forward(p: dict, cfg: MHAConfig, x, cos, sin, cache_k, cache_v,
                       cache_len, window: Optional[int] = None, lora_scaling: float = 1.0,
                       kv_mask=None):
    """Incremental attention for generation (reference: MHA `prefilling`
    :206-262 / `decoding` :264-313 paths).

    x: (B, C, H) current chunk (prompt prefill or C=1 decode step);
    cache_k/v: (B, S_max, Hkv, D); cache_len: scalar int32 — tokens already
    in the cache. Returns (out (B, C, H), new_cache_k, new_cache_v).
    """
    def _linear(x, proj):
        return lora_linear(x, proj, lora_scaling)

    b, c, _ = x.shape
    s_max = cache_k.shape[1]
    gate = None
    if cfg.with_gate:
        qg = _linear(x, p["q_proj"]).reshape(b, c, cfg.num_attention_heads, 2 * cfg.head_dim)
        q, gate = qg[..., : cfg.head_dim], qg[..., cfg.head_dim:]
    else:
        q = _linear(x, p["q_proj"]).reshape(b, c, cfg.num_attention_heads, cfg.head_dim)
    k = _linear(x, p["k_proj"]).reshape(b, c, cfg.num_key_value_heads, cfg.head_dim)
    v = _linear(x, p["v_proj"]).reshape(b, c, cfg.num_key_value_heads, cfg.head_dim)
    if cfg.qk_norm:
        zc = cfg.rms_norm_type == "zero_centered"
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, zc)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, zc)
    q, k = apply_partial_rotary(q, k, cos, sin, cfg.rope_dim)

    cache_k = jax.lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, cache_len, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, cache_len, 0, 0))

    # KV stays in cache dtype; GQA head groups contract directly with f32
    # accumulation on the MXU — no f32 cast of the (B, S, Hkv, D) cache and
    # no rep-x jnp.repeat materialization (same rework as the paged engine,
    # docs/kernels.md "Paged decode throughput").
    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hkv = cfg.num_key_value_heads
    scale = cfg.head_dim ** -0.5
    qg = q.reshape(b, c, hkv, rep, cfg.head_dim).astype(cache_k.dtype)
    logits = jnp.einsum("bcgrd,bsgd->bgrcs", qg, cache_k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits.reshape(b, hkv * rep, c, s_max)
    kpos = jnp.arange(s_max)[None, :]
    qpos = cache_len + jnp.arange(c)[:, None]
    mask = kpos <= qpos  # causal over the cache
    if window is not None:
        in_win = qpos - kpos < window
        if not isinstance(window, int):
            # traced per-layer window (generate._layer_windows): 0 = full
            in_win = in_win | (window <= 0)
        mask = mask & in_win
    mask = mask[None, None]  # (1, 1, C, S)
    if kv_mask is not None:  # (B, S): False = padding slot, never attended
        mask = mask & kv_mask[:, None, None, :]
    logits = jnp.where(mask, logits, -1e30)
    if "sinks" in p:
        sink = p["sinks"].astype(jnp.float32)[None, :, None, None]
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
        probs = jnp.exp(logits - m)
        denom = jnp.sum(probs, axis=-1, keepdims=True) + jnp.exp(sink - m)
        probs = probs / denom
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    pg = probs.reshape(b, hkv, rep, c, s_max).astype(cache_v.dtype)
    o = jnp.einsum("bgrcs,bsgd->bcgrd", pg, cache_v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, c, cfg.q_dim())
    if gate is not None:
        o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(o.dtype).reshape(
            b, c, cfg.q_dim())
    return _linear(o, p["o_proj"]), cache_k, cache_v
