"""Hybrid linear/full attention model (Qwen3.5-Text family).

Reference: xtuner/v1/model/moe/qwen3_5_text.py — GatedDeltaNet linear
attention interleaved with full attention in a fixed pattern (e.g. 3 linear :
1 full). TPU design: one scan over pattern PERIODS; each period's sub-layers
have their own stacked param trees (heterogeneous structures can't share one
stack), unrolled statically inside the scan body.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from ..checkpoint.spec import HFKey
from ..module.attention import mha_forward, mha_param_specs
from ..module.gated_deltanet import GatedDeltaNetConfig, gdn_forward, gdn_param_specs
from ..module.mlp import mlp_forward, mlp_param_specs
from ..module.params import ParamSpec, cast_tree, stack_specs
from ..module.rope import _rope_dim, model_rope_cos_sin, rope_cos_sin
from ..ops.rms_norm import rms_norm
from ..parallel.sharding import NULL_SHARD_CTX, ShardCtx
from .dense import Dense, DenseConfig, _remat_policy


class HybridConfig(DenseConfig):
    """`layer_types_pattern` repeats across num_hidden_layers (must divide)."""

    linear_attention: GatedDeltaNetConfig = GatedDeltaNetConfig()
    layer_types_pattern: list[Literal["linear", "full"]] = ["linear", "linear", "linear", "full"]

    def build(self) -> "Hybrid":
        return Hybrid(self)


class Hybrid(Dense):
    def __init__(self, cfg: HybridConfig):
        self.cfg = cfg
        assert cfg.num_hidden_layers % len(cfg.layer_types_pattern) == 0

    def _sublayer_specs(self, kind: str) -> dict:
        cfg = self.cfg
        attn = (gdn_param_specs(cfg.linear_attention, cfg.hidden_size, cfg.init_scale)
                if kind == "linear"
                else mha_param_specs(cfg.attention, cfg.hidden_size, cfg.init_scale,
                                     cfg.lora_cfg))
        return {
            "attn": attn,
            "mlp": mlp_param_specs(cfg.hidden_size, cfg.intermediate_size, cfg.init_scale,
                                   cfg.mlp_bias, cfg.lora_cfg),
            "input_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "post_attn_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }

    def param_specs(self) -> dict:
        cfg = self.cfg
        period = len(cfg.layer_types_pattern)
        n_periods = cfg.num_hidden_layers // period
        specs: dict = {
            "embed": {"w": ParamSpec((cfg.vocab_size, cfg.hidden_size),
                                     ("vocab", "embed_shard"), scale=cfg.init_scale)},
            "pattern": {
                f"p{i}": stack_specs(self._sublayer_specs(kind), n_periods)
                for i, kind in enumerate(cfg.layer_types_pattern)
            },
            "final_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"w": ParamSpec((cfg.hidden_size, cfg.vocab_size),
                                               ("embed_shard", "vocab"), scale=cfg.init_scale)}
        return specs

    def _sublayer_forward(self, x, lp, kind, cfg, cos, sin, segment_ids, sc, compute_dtype):
        lp = cast_tree(lp, compute_dtype)
        zero_c = cfg.rms_norm_type == "zero_centered"
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zero_c)
        if kind == "linear":
            h = gdn_forward(lp["attn"], cfg.linear_attention, h, segment_ids, sc)
        else:
            h = mha_forward(lp["attn"], cfg.attention, h, cos, sin, segment_ids, sc,
                            attn_impl=cfg.attn_impl)
        x = x + h
        h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zero_c)
        h = mlp_forward(lp["mlp"], h, cfg.hidden_act)
        x = x + h
        return sc(x, "batch", "seq", None)

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
        cfg = self.cfg
        if seq_ctx.inputs_embeds is not None:
            x = seq_ctx.inputs_embeds.astype(compute_dtype)
        else:
            x = jnp.take(params["embed"]["w"], seq_ctx.input_ids, axis=0).astype(compute_dtype)
        x = sc(x, "batch", "seq", None)
        cos, sin = model_rope_cos_sin(seq_ctx, _rope_dim(cfg.attention), cfg.rope_theta,
                                cfg.rope_scaling_cfg, cfg.max_position_embeddings)
        segment_ids = seq_ctx.segment_ids
        pattern = cfg.layer_types_pattern

        def period_fn(x, lp_tuple):
            for i, kind in enumerate(pattern):
                x = self._sublayer_forward(x, lp_tuple[f"p{i}"], kind, cfg, cos, sin,
                                           segment_ids, sc, compute_dtype)
            return x, None

        policy = _remat_policy(remat)
        if policy != "none":
            period_fn = jax.checkpoint(period_fn, policy=policy, prevent_cse=False)
        x, _ = jax.lax.scan(period_fn, x, params["pattern"])
        x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                     cfg.rms_norm_type == "zero_centered")
        return x.astype(compute_dtype)

    # ------------------------------------------------------------------
    # cached generation (decode hooks consumed by model/generate.py).
    # Linear layers carry an O(1) recurrent cache (fast-weight state S +
    # conv rolling buffer) instead of KV — the linear-attention decode win.
    def init_decode_cache(self, batch_size: int, max_length: int, dtype):
        return _hybrid_init_cache(self.cfg, batch_size, max_length, dtype,
                                  self._decode_sublayer_kinds())

    def _decode_sublayer_kinds(self):
        return list(self.cfg.layer_types_pattern)

    def forward_cached(self, params, ids, positions, caches, cache_len,
                       compute_dtype, kv_mask=None, record_routing=False,
                       n_valid=None):
        return _hybrid_forward_cached(self, params, ids, positions, caches,
                                      cache_len, compute_dtype, kv_mask,
                                      n_valid=n_valid)

    def _cached_sublayer(self, x, lp, kind, cfg, cos, sin, cache, cache_len,
                         kv_mask, valid, compute_dtype, n_valid=None):
        """One decode sub-layer; cache = (ck, cv) for full attention or
        (S, conv_buf) for GatedDeltaNet."""
        from ..module.attention import mha_cached_forward
        from ..module.gated_deltanet import gdn_cached_forward

        lp = cast_tree(lp, compute_dtype)
        zero_c = cfg.rms_norm_type == "zero_centered"
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zero_c)
        if kind == "linear":
            h, s_new, conv_new = gdn_cached_forward(
                lp["attn"], cfg.linear_attention, h, cache[0], cache[1], valid,
                n_valid=n_valid)
            cache = (s_new, conv_new)
        else:
            h, ck, cv = mha_cached_forward(
                lp["attn"], cfg.attention, h, cos, sin, cache[0], cache[1],
                cache_len,
                window=cfg.sliding_window if cfg.use_sliding_window else None,
                kv_mask=kv_mask)
            cache = (ck, cv)
        x = x + h
        h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zero_c)
        x = x + self._cached_ffn(lp, h, cfg, compute_dtype)
        return x, cache

    def _cached_ffn(self, lp, h, cfg, compute_dtype):
        return mlp_forward(lp["mlp"], h, cfg.hidden_act)

    def hf_key_map(self) -> dict:
        # Qwen3.5 HF layout round-trips per sub-stack; self-consistent save/load
        cfg = self.cfg
        period = len(cfg.layer_types_pattern)

        def sub_map(kind: str, pos: int) -> dict:
            # layer index in HF numbering = period_idx * period + pos; our
            # stacks are indexed by period, so use a stride via layer_offset
            # trick: template with computed index is handled at save/load by
            # the stacked {layer} * period + pos convention
            prefix = f"model.layers.{{layer}}"
            if kind == "linear":
                attn = {
                    "in_proj_qkvz": {"w": HFKey(f"{prefix}.linear_attn.in_proj_qkvz.weight", "linear")},
                    "in_proj_ba": {"w": HFKey(f"{prefix}.linear_attn.in_proj_ba.weight", "linear")},
                    "conv_w": HFKey(f"{prefix}.linear_attn.conv1d.weight"),
                    "a_log": HFKey(f"{prefix}.linear_attn.A_log"),
                    "dt_bias": HFKey(f"{prefix}.linear_attn.dt_bias"),
                    "norm": HFKey(f"{prefix}.linear_attn.norm.weight"),
                    "out_proj": {"w": HFKey(f"{prefix}.linear_attn.out_proj.weight", "linear")},
                }
            else:
                attn = {
                    "q_proj": {"w": HFKey(f"{prefix}.self_attn.q_proj.weight", "linear")},
                    "k_proj": {"w": HFKey(f"{prefix}.self_attn.k_proj.weight", "linear")},
                    "v_proj": {"w": HFKey(f"{prefix}.self_attn.v_proj.weight", "linear")},
                    "o_proj": {"w": HFKey(f"{prefix}.self_attn.o_proj.weight", "linear")},
                }
                if cfg.attention.qk_norm:
                    attn["q_norm"] = HFKey(f"{prefix}.self_attn.q_norm.weight")
                    attn["k_norm"] = HFKey(f"{prefix}.self_attn.k_norm.weight")
            return {
                "attn": attn,
                "mlp": {
                    "gate_proj": {"w": HFKey(f"{prefix}.mlp.gate_proj.weight", "linear")},
                    "up_proj": {"w": HFKey(f"{prefix}.mlp.up_proj.weight", "linear")},
                    "down_proj": {"w": HFKey(f"{prefix}.mlp.down_proj.weight", "linear")},
                },
                "input_norm": HFKey(f"{prefix}.input_layernorm.weight"),
                "post_attn_norm": HFKey(f"{prefix}.post_attention_layernorm.weight"),
            }

        keymap: dict = {
            "embed": {"w": HFKey("model.embed_tokens.weight")},
            "pattern": {
                f"p{i}": jax.tree.map(
                    lambda leaf, i=i: HFKey(leaf.template, leaf.transform,
                                            layer_offset=i, layer_stride=period),
                    sub_map(kind, i), is_leaf=lambda x: isinstance(x, HFKey))
                for i, kind in enumerate(cfg.layer_types_pattern)
            },
            "final_norm": HFKey("model.norm.weight"),
        }
        if not cfg.tie_word_embeddings:
            keymap["lm_head"] = {"w": HFKey("lm_head.weight", "linear")}
        return keymap


# ---------------------------------------------------------------------------
# shared cached-generation machinery for the pattern-stacked hybrids
# ---------------------------------------------------------------------------
def _hybrid_init_cache(cfg, batch_size: int, max_length: int, dtype, kinds):
    period = len(kinds)
    n_periods = cfg.num_hidden_layers // period
    la = cfg.linear_attention
    attn = cfg.attention
    caches = {}
    for i, kind in enumerate(kinds):
        if kind == "linear":
            s = jnp.zeros((n_periods, batch_size, la.num_v_heads,
                           la.head_k_dim, la.head_v_dim), jnp.float32)
            conv = jnp.zeros((n_periods, batch_size, la.conv_kernel_size - 1,
                              la.conv_channels), dtype)
            caches[f"p{i}"] = (s, conv)
        else:
            shape = (n_periods, batch_size, max_length,
                     attn.num_key_value_heads, attn.head_dim)
            caches[f"p{i}"] = (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
    return caches


def _hybrid_forward_cached(model, params, ids, positions, caches, cache_len,
                           compute_dtype, kv_mask=None, n_valid=None):
    """(logits (B, C, V), new caches, None) — the hybrid analog of
    model/generate._forward_cached, scanning pattern PERIODS with per-slot
    heterogeneous caches riding the scan xs/ys."""
    cfg = model.cfg
    pattern = cfg.layer_types_pattern
    b, c = ids.shape
    x = jnp.take(params["embed"]["w"], ids, axis=0).astype(compute_dtype)
    cos, sin = rope_cos_sin(positions, _rope_dim(cfg.attention), cfg.rope_theta,
                            cfg.rope_scaling_cfg, cfg.max_position_embeddings)
    # GDN validity of the CURRENT chunk's slots (left-pad protection): at
    # prefill the chunk occupies slots [0, C) of the kv_mask; decode steps
    # are always-valid single tokens
    valid = kv_mask[:, :c] if (kv_mask is not None and c > 1) else None

    def period_fn(x, lp_and_cache):
        lp_tuple, cache_tuple = lp_and_cache
        new_caches = {}
        for i, kind in enumerate(pattern):
            x, new_caches[f"p{i}"] = model._cached_sublayer(
                x, lp_tuple[f"p{i}"], kind, cfg, cos, sin, cache_tuple[f"p{i}"],
                cache_len, kv_mask, valid, compute_dtype, n_valid=n_valid)
        return x, new_caches

    x, new_caches = jax.lax.scan(period_fn, x, (params["pattern"], caches))
    x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                 cfg.rms_norm_type == "zero_centered")
    logits = jnp.dot(x.astype(compute_dtype),
                     model.lm_head_weight(params).astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return logits, new_caches, None


# ---------------------------------------------------------------------------
# Hybrid MoE (Qwen3.5 text family)
# ---------------------------------------------------------------------------
from ..loss.moe_loss import balancing_loss, z_loss  # noqa: E402
from ..module.moe_layer import expert_mlp_param_specs, moe_mlp_forward  # noqa: E402
from ..module.router import router_param_specs  # noqa: E402
from .moe import MoE, MoEConfig  # noqa: E402


class HybridMoEConfig(MoEConfig):
    """Qwen3.5 hybrid MoE: GatedDeltaNet linear attention interleaved with
    gated full attention, MoE FFN everywhere (reference
    moe/qwen3_5_text.py:200-272 — layers_type = 3 linear : 1 full)."""

    linear_attention: GatedDeltaNetConfig = GatedDeltaNetConfig()
    layer_types_pattern: list[Literal["linear", "full"]] = ["linear", "linear", "linear", "full"]
    # Qwen3-Next style sigmoid gate on the shared expert output
    with_shared_expert_gate: bool = True

    def build(self) -> "HybridMoE":
        return HybridMoE(self)


class HybridMoE(MoE):
    def __init__(self, cfg: HybridMoEConfig):
        self.cfg = cfg
        assert cfg.num_hidden_layers % len(cfg.layer_types_pattern) == 0
        assert cfg.first_k_dense_replace == 0, "hybrid MoE has no dense head layers"

    def _sublayer_specs(self, kind: str) -> dict:
        cfg = self.cfg
        attn = (gdn_param_specs(cfg.linear_attention, cfg.hidden_size, cfg.init_scale)
                if kind == "linear"
                else mha_param_specs(cfg.attention, cfg.hidden_size, cfg.init_scale))
        specs = {
            "attn": attn,
            "input_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "post_attn_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "router": router_param_specs(cfg.router, cfg.hidden_size, cfg.n_routed_experts),
            "experts": expert_mlp_param_specs(cfg.hidden_size, cfg.moe_intermediate_size,
                                              cfg.n_routed_experts, cfg.init_scale),
        }
        if cfg.n_shared_experts > 0:
            specs["shared_experts"] = mlp_param_specs(
                cfg.hidden_size, cfg.moe_intermediate_size * cfg.n_shared_experts,
                cfg.init_scale)
            if cfg.with_shared_expert_gate:
                specs["shared_expert_gate"] = {
                    "w": ParamSpec((cfg.hidden_size, 1), (None, None), scale=cfg.init_scale)}
        return specs

    def param_specs(self) -> dict:
        cfg = self.cfg
        period = len(cfg.layer_types_pattern)
        n_periods = cfg.num_hidden_layers // period
        specs: dict = {
            "embed": {"w": ParamSpec((cfg.vocab_size, cfg.hidden_size),
                                     ("vocab", "embed_shard"), scale=cfg.init_scale)},
            "pattern": {
                f"p{i}": stack_specs(self._sublayer_specs(kind), n_periods)
                for i, kind in enumerate(cfg.layer_types_pattern)
            },
            "final_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"w": ParamSpec((cfg.hidden_size, cfg.vocab_size),
                                               ("embed_shard", "vocab"), scale=cfg.init_scale)}
        if cfg.rope_scaling_cfg is not None and cfg.rope_scaling_cfg.use_fope:
            from ..module.rope import _rope_dim, fope_param_specs

            specs["fope"] = fope_param_specs(_rope_dim(cfg.attention), cfg.rope_theta,
                                             cfg.rope_scaling_cfg,
                                             cfg.max_position_embeddings)
        return specs

    def _hybrid_moe_sublayer(self, x, lp, kind, cfg, cos, sin, segment_ids, valid,
                             sc, compute_dtype):
        lp = cast_tree(lp, compute_dtype)
        zero_c = cfg.rms_norm_type == "zero_centered"
        h = sc(rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zero_c),
               "batch", "seq", None)
        if kind == "linear":
            h = gdn_forward(lp["attn"], cfg.linear_attention, h, segment_ids, sc)
        else:
            h = mha_forward(lp["attn"], cfg.attention, h, cos, sin, segment_ids, sc,
                            window=cfg.sliding_window if cfg.use_sliding_window else None,
                            attn_impl=cfg.attn_impl)
        x = x + h
        h = sc(rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zero_c),
               "batch", "seq", None)
        moe_out, r, load = moe_mlp_forward(
            lp["experts"], lp["router"], cfg.router, h,
            num_experts=cfg.n_routed_experts, top_k=cfg.num_experts_per_tok,
            act=cfg.hidden_act, compute_dtype=compute_dtype,
            dispatcher=cfg.dispatcher, sc=sc,
            gemm_impl=getattr(cfg, "grouped_gemm_impl", "ragged_dot"))
        if "shared_experts" in lp:
            shared = mlp_forward(lp["shared_experts"], h, cfg.hidden_act)
            if "shared_expert_gate" in lp:
                # Qwen3-Next shared expert gate: sigmoid(x @ w) scalar per token
                gate = jax.nn.sigmoid((h @ lp["shared_expert_gate"]["w"]).astype(jnp.float32))
                shared = shared * gate.astype(shared.dtype)
            moe_out = moe_out + shared
        x = sc(x + moe_out, "batch", "seq", None)
        bal, _ = balancing_loss(r.probs, r.topk_idx, valid,
                                cfg.n_routed_experts, cfg.num_experts_per_tok)
        return x, (bal, z_loss(r.logits, valid), load)

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
        from ..module.rope import _rope_dim, model_rope_cos_sin

        cfg = self.cfg
        if seq_ctx.inputs_embeds is not None:
            x = seq_ctx.inputs_embeds.astype(compute_dtype)
        else:
            x = jnp.take(params["embed"]["w"], seq_ctx.input_ids, axis=0).astype(compute_dtype)
        x = sc(x, "batch", "seq", None)
        cos, sin = model_rope_cos_sin(seq_ctx, _rope_dim(cfg.attention), cfg.rope_theta,
                                      cfg.rope_scaling_cfg, cfg.max_position_embeddings,
                                      fope_params=params.get("fope"))
        segment_ids = seq_ctx.segment_ids
        valid = (segment_ids != 0).reshape(-1)
        pattern = cfg.layer_types_pattern

        def period_fn(x, lp_tuple):
            bals, zls, loads = [], [], []
            for i, kind in enumerate(pattern):
                x, (b_, z_, l_) = self._hybrid_moe_sublayer(
                    x, lp_tuple[f"p{i}"], kind, cfg, cos, sin, segment_ids, valid,
                    sc, compute_dtype)
                bals.append(b_); zls.append(z_); loads.append(l_)
            return x, (jnp.stack(bals), jnp.stack(zls), jnp.stack(loads))

        policy = _remat_policy(remat)
        if policy != "none":
            period_fn = jax.checkpoint(period_fn, policy=policy, prevent_cse=False)
        x, (bal, zl, load) = jax.lax.scan(period_fn, x, params["pattern"])
        self._last_trunk = x
        x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                     cfg.rms_norm_type == "zero_centered")
        self._last_aux = (bal.reshape(-1), zl.reshape(-1), load.reshape(-1, load.shape[-1]))
        self._last_idx_loss = jnp.float32(0.0)  # no DSA sublayers in hybrid
        return x.astype(compute_dtype)

    # ---------------- cached generation (decode hooks) ----------------
    init_decode_cache = Hybrid.init_decode_cache
    _decode_sublayer_kinds = Hybrid._decode_sublayer_kinds
    forward_cached = Hybrid.forward_cached
    _cached_sublayer = Hybrid._cached_sublayer

    def _cached_ffn(self, lp, h, cfg, compute_dtype):
        moe_out, _, _ = moe_mlp_forward(
            lp["experts"], lp["router"], cfg.router, h,
            num_experts=cfg.n_routed_experts, top_k=cfg.num_experts_per_tok,
            act=cfg.hidden_act, compute_dtype=compute_dtype)
        if "shared_experts" in lp:
            shared = mlp_forward(lp["shared_experts"], h, cfg.hidden_act)
            if "shared_expert_gate" in lp:
                gate = jax.nn.sigmoid((h @ lp["shared_expert_gate"]["w"]).astype(jnp.float32))
                shared = shared * gate.astype(shared.dtype)
            moe_out = moe_out + shared
        return moe_out

    def hf_key_map(self) -> dict:
        """Qwen3.5 HF-style layout, layer index = period_idx * period + pos."""
        cfg = self.cfg
        period = len(cfg.layer_types_pattern)

        def sub_map(kind: str) -> dict:
            prefix = "model.layers.{layer}"
            if kind == "linear":
                attn = {
                    "in_proj_qkvz": {"w": HFKey(f"{prefix}.linear_attn.in_proj_qkvz.weight", "linear")},
                    "in_proj_ba": {"w": HFKey(f"{prefix}.linear_attn.in_proj_ba.weight", "linear")},
                    "conv_w": HFKey(f"{prefix}.linear_attn.conv1d.weight"),
                    "a_log": HFKey(f"{prefix}.linear_attn.A_log"),
                    "dt_bias": HFKey(f"{prefix}.linear_attn.dt_bias"),
                    "norm": HFKey(f"{prefix}.linear_attn.norm.weight"),
                    "out_proj": {"w": HFKey(f"{prefix}.linear_attn.out_proj.weight", "linear")},
                }
            else:
                attn = {
                    "q_proj": {"w": HFKey(f"{prefix}.self_attn.q_proj.weight", "linear")},
                    "k_proj": {"w": HFKey(f"{prefix}.self_attn.k_proj.weight", "linear")},
                    "v_proj": {"w": HFKey(f"{prefix}.self_attn.v_proj.weight", "linear")},
                    "o_proj": {"w": HFKey(f"{prefix}.self_attn.o_proj.weight", "linear")},
                }
                if cfg.attention.qk_norm:
                    attn["q_norm"] = HFKey(f"{prefix}.self_attn.q_norm.weight")
                    attn["k_norm"] = HFKey(f"{prefix}.self_attn.k_norm.weight")
            sub = {
                "attn": attn,
                "input_norm": HFKey(f"{prefix}.input_layernorm.weight"),
                "post_attn_norm": HFKey(f"{prefix}.post_attention_layernorm.weight"),
                "router": {"w": HFKey(f"{prefix}.mlp.gate.weight", "linear")},
                "experts": {
                    "gate_proj": HFKey(f"{prefix}.mlp.experts.{{expert}}.gate_proj.weight", "expert_linear"),
                    "up_proj": HFKey(f"{prefix}.mlp.experts.{{expert}}.up_proj.weight", "expert_linear"),
                    "down_proj": HFKey(f"{prefix}.mlp.experts.{{expert}}.down_proj.weight", "expert_linear"),
                },
            }
            if cfg.n_shared_experts > 0:
                sub["shared_experts"] = {
                    "gate_proj": {"w": HFKey(f"{prefix}.mlp.shared_expert.gate_proj.weight", "linear")},
                    "up_proj": {"w": HFKey(f"{prefix}.mlp.shared_expert.up_proj.weight", "linear")},
                    "down_proj": {"w": HFKey(f"{prefix}.mlp.shared_expert.down_proj.weight", "linear")},
                }
                if cfg.with_shared_expert_gate:
                    sub["shared_expert_gate"] = {
                        "w": HFKey(f"{prefix}.mlp.shared_expert_gate.weight", "linear")}
            return sub

        keymap: dict = {
            "embed": {"w": HFKey("model.embed_tokens.weight")},
            "pattern": {
                f"p{i}": jax.tree.map(
                    lambda leaf, i=i: HFKey(leaf.template, leaf.transform,
                                            layer_offset=i, layer_stride=period),
                    sub_map(kind), is_leaf=lambda x: isinstance(x, HFKey))
                for i, kind in enumerate(cfg.layer_types_pattern)
            },
            "final_norm": HFKey("model.norm.weight"),
        }
        if not cfg.tie_word_embeddings:
            keymap["lm_head"] = {"w": HFKey("lm_head.weight", "linear")}
        if cfg.rope_scaling_cfg is not None and cfg.rope_scaling_cfg.use_fope:
            keymap["fope"] = {"sin_coef": HFKey("model.rotary_emb.sin_coef"),
                              "cos_coef": HFKey("model.rotary_emb.cos_coef")}
        return keymap


def qwen3_5_moe_35b_a3b() -> HybridMoEConfig:
    """Qwen3.5-35B-A3B hybrid MoE (reference Qwen3_5_VLTextMoE35BA3BConfig,
    moe/qwen3_5_text.py:218-272): 40 layers in 3 GatedDeltaNet : 1 gated full
    attention pattern, 256 experts top-8 + gated shared expert, partial
    rotary 0.25 with interleaved MRoPE sections [11, 11, 10]."""
    from ..module.attention import MHAConfig
    from ..module.rope import RopeScalingConfig

    return HybridMoEConfig(
        vocab_size=248320,
        max_position_embeddings=262144,
        eos_token_id=248044,
        num_hidden_layers=40,
        hidden_size=2048,
        intermediate_size=0,  # unused: every FFN is MoE
        rms_norm_type="zero_centered",
        rope_theta=10000000.0,
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl",
                                           mrope_section=[11, 11, 10]),
        attention=MHAConfig(num_attention_heads=16, num_key_value_heads=2,
                            head_dim=256, qk_norm=True, with_gate=True,
                            rms_norm_type="zero_centered",
                            partial_rotary_factor=0.25),
        linear_attention=GatedDeltaNetConfig(num_v_heads=32, num_k_heads=16,
                                             head_k_dim=128, head_v_dim=128,
                                             conv_kernel_size=4),
        n_routed_experts=256,
        n_shared_experts=1,
        num_experts_per_tok=8,
        moe_intermediate_size=512,
        balancing_loss_coef=0.001,
    )
