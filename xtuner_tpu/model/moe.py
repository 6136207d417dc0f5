"""Dropless MoE transformer — the flagship model family.

Reference: xtuner/v1/model/moe/moe.py (MoE :181, MoEConfig :140-178) + presets
(qwen3.py). TPU redesign notes:

- Expert weights live stacked (E, in, out) with E sharded over the `ep` mesh
  axis and the hidden dim over `fsdp` — the GSPMD expression of the
  reference's `Shard(0)`-on-ep + FSDP placement (moe.py:1342-1429); XLA
  derives the token redistribution collectives from the shardings.
- The layer stack runs under `lax.scan`; per-layer aux losses (balancing,
  z-loss) are collected as scan outputs and folded into the total loss — the
  reference's AuxLossScaler gradient-grafting (aux_loss.py:10-31) is
  unnecessary with a single backward pass.
- first_k_dense_replace dense layers form their own scanned stack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..checkpoint.spec import HFKey
from ..loss.ce_loss import ce_loss
from ..loss.moe_loss import balancing_loss, z_loss
from ..module.attention import mha_forward, mha_param_specs
from ..module.mla import MLAConfig, mla_forward, mla_param_specs
from ..module.mlp import mlp_forward, mlp_param_specs
from ..module.moe_layer import expert_mlp_param_specs, moe_mlp_forward
from ..module.params import ParamSpec, cast_tree, stack_specs
from ..module.rope import _rope_dim, model_rope_cos_sin
from ..module.router import GreedyRouterConfig, RouterConfig, router_param_specs
from ..ops.rms_norm import rms_norm
from ..parallel.sharding import NULL_SHARD_CTX, ShardCtx
from .base import ModelOutputs
from .dense import Dense, DenseConfig, _attn_param_specs, _is_dsa, _remat_policy


class MoEConfig(DenseConfig):
    """Field names mirror the reference MoEConfig (moe/moe.py:140-178)."""

    n_routed_experts: int = 8
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 1024
    first_k_dense_replace: int = 0
    n_shared_experts: int = 0
    router: RouterConfig = GreedyRouterConfig()
    balancing_loss_coef: float = 0.0
    z_loss_coef: float = 0.0
    # per-layer sliding-window pattern with static period, e.g. [128, None]
    # (GPT-OSS alternates sliding/full attention); None = uniform
    layer_window_pattern: Optional[list[Optional[int]]] = None
    # "gspmd" (sharding-derived collectives) | "a2a" (explicit shard_map
    # ragged all-to-all over ep — reference dispatcher: deepep/all2all) |
    # "agrs" (all-gather + reduce-scatter over ep — reference dispatcher/agrs.py)
    dispatcher: str = "gspmd"
    # expert grouped-GEMM implementation: "auto" (Pallas on TPU backends for
    # lane-aligned shapes and training-size token counts, XLA ragged_dot
    # otherwise) | "ragged_dot" | "pallas". The Pallas visit-table kernels
    # (ops/bf16_grouped.py) measure 94-109 TF/s vs ragged_dot's 67-84 on the
    # moe_heavy bench geometry (+8.6% whole-step; docs/kernels.md)
    grouped_gemm_impl: str = "auto"
    # HF expert tensor layout: "per_expert" (one (out,in) tensor per expert,
    # qwen3_moe et al) | "fused_3d" (gate_up_proj (E,H,2F) + down_proj (E,F,H),
    # qwen3_vl_moe Qwen3VLMoeTextExperts)
    hf_expert_format: str = "per_expert"
    # multi-token prediction (reference module/mtp/, DeepSeek V3 / GLM-5)
    mtp_num_layers: int = 0
    mtp_loss_coef: float = 0.3
    # one physical MTP layer reused across all depths (reference
    # mtp/config.py:49 share_weights; GLM-5.2 trains with it, glm52.py:373)
    mtp_share_weights: bool = False
    # note: `intermediate_size` is the DENSE layer / shared-expert width

    def build(self) -> "MoE":
        return MoE(self)


class MoE(Dense):
    def __init__(self, cfg: MoEConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------
    def moe_layer_param_specs(self) -> dict:
        cfg = self.cfg
        attn_specs = _attn_param_specs(cfg)
        specs = {
            "attn": attn_specs,
            "input_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "post_attn_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "router": router_param_specs(cfg.router, cfg.hidden_size, cfg.n_routed_experts),
            "experts": expert_mlp_param_specs(cfg.hidden_size, cfg.moe_intermediate_size,
                                              cfg.n_routed_experts, cfg.init_scale),
        }
        if cfg.n_shared_experts > 0:
            specs["shared_experts"] = mlp_param_specs(
                cfg.hidden_size, cfg.moe_intermediate_size * cfg.n_shared_experts,
                cfg.init_scale,
            )
        return specs

    def param_specs(self) -> dict:
        cfg = self.cfg
        specs: dict = {
            "embed": {"w": ParamSpec((cfg.vocab_size, cfg.hidden_size), ("vocab", "embed_shard"),
                                     scale=cfg.init_scale)},
            "final_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }
        if cfg.first_k_dense_replace > 0:
            specs["dense_layers"] = stack_specs(self.layer_param_specs(), cfg.first_k_dense_replace)
        n_moe = cfg.num_hidden_layers - cfg.first_k_dense_replace
        specs["moe_layers"] = stack_specs(self.moe_layer_param_specs(), n_moe)
        if cfg.mtp_num_layers > 0:
            from ..module.mtp import mtp_extra_param_specs

            mtp_specs = {**self.moe_layer_param_specs(),
                         **mtp_extra_param_specs(cfg.hidden_size, cfg.init_scale)}
            n_phys = 1 if cfg.mtp_share_weights else cfg.mtp_num_layers
            specs["mtp_layers"] = stack_specs(mtp_specs, n_phys)
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"w": ParamSpec((cfg.hidden_size, cfg.vocab_size),
                                               ("embed_shard", "vocab"), scale=cfg.init_scale)}
        if cfg.rope_scaling_cfg is not None and cfg.rope_scaling_cfg.use_fope:
            from ..module.rope import _rope_dim as _rd, fope_param_specs

            specs["fope"] = fope_param_specs(_rd(cfg.attention), cfg.rope_theta,
                                             cfg.rope_scaling_cfg,
                                             cfg.max_position_embeddings)
        return specs

    # ------------------------------------------------------------------
    def _moe_layer_forward(self, x, lp, cfg, cos, sin, segment_ids, valid, sc, compute_dtype,
                           window="cfg", forced_routing=None):
        # NOTE: XLA converts the scanned layer stack to bf16 ONCE before the
        # loop (the while body then carries bf16 xs) — ~2 bytes/param of
        # transient copies that can't be avoided while masters are f32;
        # an optimization_barrier before the cast does NOT stop the rewrite
        # (verified against the compiled HLO, round 3)
        lp = cast_tree(lp, compute_dtype)
        zero_centered = cfg.rms_norm_type == "zero_centered"
        if window == "cfg":
            window = cfg.sliding_window if cfg.use_sliding_window else None
        # pin the normed activation to the data layout: without this the
        # partitioner re-shards it to contracting-dim layout for the
        # fsdp-sharded qkv dots, tripping SPMD involuntary full remat on the
        # (fsdp, ep) mesh (XLA b/433785288)
        h = sc(rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zero_centered),
               "batch", "seq", None)
        idx_loss = jnp.float32(0.0)
        if _is_dsa(cfg.attention):
            from ..module.dsa import dsa_forward

            h, _, idx_loss = dsa_forward(lp["attn"], cfg.attention, h, cos, sin,
                                         segment_ids, sc,
                                         rope_scaling=cfg.rope_scaling_cfg)
        elif isinstance(cfg.attention, MLAConfig):
            h = mla_forward(lp["attn"], cfg.attention, h, cos, sin, segment_ids, sc,
                            rope_scaling=cfg.rope_scaling_cfg, attn_impl=cfg.attn_impl)
        else:
            h = mha_forward(lp["attn"], cfg.attention, h, cos, sin, segment_ids, sc,
                            window=window, attn_impl=cfg.attn_impl,
                            fp8_cfg=cfg.float8_cfg)
        x = x + h
        h = sc(rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zero_centered),
               "batch", "seq", None)
        moe_out, r, load = moe_mlp_forward(
            lp["experts"], lp["router"], cfg.router, h,
            num_experts=cfg.n_routed_experts, top_k=cfg.num_experts_per_tok,
            act=cfg.hidden_act, compute_dtype=compute_dtype,
            dispatcher=cfg.dispatcher, sc=sc, forced_topk_idx=forced_routing,
            fp8_cfg=cfg.float8_cfg, gemm_impl=cfg.grouped_gemm_impl,
        )
        if "shared_experts" in lp:
            moe_out = moe_out + mlp_forward(lp["shared_experts"], h, cfg.hidden_act)
        from jax.ad_checkpoint import checkpoint_name

        moe_out = checkpoint_name(moe_out, "moe_out")  # saveable by remat policies
        x = x + moe_out
        x = sc(x, "batch", "seq", None)
        bal, _ = balancing_loss(r.probs, r.topk_idx, valid,
                                cfg.n_routed_experts, cfg.num_experts_per_tok)
        zl = z_loss(r.logits, valid)
        return x, (bal, zl, load, idx_loss)

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
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
        policy = _remat_policy(remat)
        ds = seq_ctx.deepstack_embeds  # (n_ds, B, L, H) pre-scattered or None
        if ds is not None and (cfg.first_k_dense_replace > 0 or cfg.layer_window_pattern):
            raise NotImplementedError(
                "deepstack injection assumes the first n_ds layers are plain MoE "
                "layers (Qwen3-VL MoE shape: first_k_dense_replace=0, no window pattern)")

        dense_idx_loss = jnp.float32(0.0)
        if cfg.first_k_dense_replace > 0:
            def dense_fn(x, lp):
                x, idx = self._layer_forward(x, lp, cfg, cos, sin, segment_ids, sc,
                                             compute_dtype)
                return x, idx
            if policy != "none":
                dense_fn = jax.checkpoint(dense_fn, policy=policy, prevent_cse=False)
            x, dense_idx = jax.lax.scan(dense_fn, x, params["dense_layers"])
            dense_idx_loss = jnp.sum(dense_idx)

        pattern = cfg.layer_window_pattern
        if pattern:
            period = len(pattern)
            stacked = jax.tree.map(
                lambda a: a.reshape(a.shape[0] // period, period, *a.shape[1:]),
                params["moe_layers"])

            def moe_fn(x, lp):
                bals, zls, loads = [], [], []
                idxs = []
                for k in range(period):  # static unroll within the scan body
                    sub = jax.tree.map(lambda a: a[k], lp)
                    x, (b_, z_, l_, i_) = self._moe_layer_forward(
                        x, sub, cfg, cos, sin, segment_ids, valid, sc, compute_dtype,
                        window=pattern[k])
                    bals.append(b_); zls.append(z_); loads.append(l_); idxs.append(i_)
                return x, (jnp.stack(bals), jnp.stack(zls), jnp.stack(loads),
                           jnp.stack(idxs))

            if policy != "none":
                moe_fn = jax.checkpoint(moe_fn, policy=policy, prevent_cse=False)
            x, (bal, zl, load, idxl) = jax.lax.scan(moe_fn, x, stacked)
            bal, zl = bal.reshape(-1), zl.reshape(-1)
            load = load.reshape(-1, load.shape[-1])
        elif seq_ctx.rollout_routed_experts is not None:
            # R3 rollout-routing replay (reference trainer/worker.py:473 +
            # greedy.py:74): per-layer recorded expert ids ride the scan xs;
            # entries < 0 (prompt/pad positions) keep fresh routing
            rre = seq_ctx.rollout_routed_experts  # (B, L, nL_moe, K) int32
            nl = rre.shape[2]
            routing_xs = jnp.transpose(rre, (2, 0, 1, 3)).reshape(
                nl, rre.shape[0] * rre.shape[1], rre.shape[3])

            def moe_replay_fn(x, xs):
                lp, fr = xs
                return self._moe_layer_forward(x, lp, cfg, cos, sin, segment_ids,
                                               valid, sc, compute_dtype,
                                               forced_routing=fr)

            if policy != "none":
                moe_replay_fn = jax.checkpoint(moe_replay_fn, policy=policy,
                                               prevent_cse=False)
            x, (bal, zl, load, idxl) = jax.lax.scan(
                moe_replay_fn, x, (params["moe_layers"], routing_xs))
        else:
            def moe_fn(x, lp):
                return self._moe_layer_forward(x, lp, cfg, cos, sin, segment_ids, valid,
                                               sc, compute_dtype)
            if policy != "none":
                moe_fn = jax.checkpoint(moe_fn, policy=policy, prevent_cse=False)
            if ds is not None:
                # Qwen3-VL deepstack (reference moe/qwen3vl_text.py): add the
                # pre-scattered visual features after each of the first n_ds layers
                n_ds = ds.shape[0]
                head = jax.tree.map(lambda a: a[:n_ds], params["moe_layers"])
                tail = jax.tree.map(lambda a: a[n_ds:], params["moe_layers"])

                def moe_ds_fn(x, xs):
                    lp, add = xs
                    x, aux = moe_fn(x, lp)
                    return x + add.astype(x.dtype), aux

                x, (bal0, zl0, load0, idx0) = jax.lax.scan(moe_ds_fn, x, (head, ds))
                x, (bal1, zl1, load1, idx1) = jax.lax.scan(moe_fn, x, tail)
                bal = jnp.concatenate([bal0, bal1])
                zl = jnp.concatenate([zl0, zl1])
                load = jnp.concatenate([load0, load1])
                idxl = jnp.concatenate([idx0, idx1])
            else:
                x, (bal, zl, load, idxl) = jax.lax.scan(moe_fn, x, params["moe_layers"])

        self._last_trunk = x  # pre-final-norm trunk (MTP input; same trace)
        x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                     cfg.rms_norm_type == "zero_centered")
        # NOTE: aux stash is trace-local state consumed by loss() in the same
        # trace; forward() used standalone simply ignores it
        self._last_aux = (bal, zl, load)  # per-layer arrays (scan outputs)
        self._last_idx_loss = dense_idx_loss + jnp.sum(idxl)
        return x.astype(compute_dtype)

    def loss(self, params, seq_ctx, shifted_labels, loss_weights, global_denom,
             sc: ShardCtx = NULL_SHARD_CTX, compute_dtype=jnp.bfloat16,
             remat: str = "full") -> ModelOutputs:
        cfg = self.cfg
        hidden = self.forward(params, seq_ctx, sc, compute_dtype, remat)
        bal, zl, load = self._last_aux
        w = self.lm_head_weight(params).astype(compute_dtype)
        lm, sum_ce, num_tokens = ce_loss(hidden, w, shifted_labels, loss_weights,
                                         global_denom, cfg.lm_loss_cfg, sc=sc)
        out = ModelOutputs(loss=lm, sum_ce=sum_ce, num_tokens=num_tokens,
                           expert_load=load)
        idx_loss = self._last_idx_loss
        if cfg.mtp_num_layers > 0:
            # MTP layers are routed layers too: their balancing/z rows join
            # the main stack's aux means, their expert loads join the noaux
            # bias update and maxvio (reference accumulates MoE stats "main
            # layers first, then MTP depths", moe.py:311-349)
            mtp_lm, (mtp_bal, mtp_zl, mtp_load, mtp_idx) = self._mtp_loss(
                params, seq_ctx, shifted_labels, loss_weights, global_denom,
                sc, compute_dtype)
            out.mtp_loss = mtp_lm
            out.mtp_expert_load = mtp_load
            bal = jnp.concatenate([bal, mtp_bal])
            zl = jnp.concatenate([zl, mtp_zl])
            idx_loss = idx_loss + jnp.sum(mtp_idx)
        if _is_dsa(cfg.attention):
            out.dsa_index_loss = cfg.dsa_index_loss_coef * idx_loss
        if cfg.balancing_loss_coef > 0:
            out.balancing_loss = cfg.balancing_loss_coef * jnp.mean(bal)
        if cfg.z_loss_coef > 0:
            out.z_loss = cfg.z_loss_coef * jnp.mean(zl)
        return out

    def _mtp_loss(self, params, seq_ctx, shifted_labels, loss_weights, global_denom,
                  sc, compute_dtype):
        """Depth-k MTP: fuse trunk hidden with next-token embeddings, run the
        extra layer(s), score against labels shifted k further (module/mtp.py).
        Returns (loss, (bal (depths,), zl (depths,), load (depths, E),
        idx (depths,))) so MTP routers get the same aux-loss/bias maintenance
        as the main stack."""
        from ..module.mtp import mtp_fuse, shift_for_mtp
        from ..module.rope import rope_cos_sin

        cfg = self.cfg
        seg = seq_ctx.segment_ids
        cos, sin = rope_cos_sin(seq_ctx.position_ids, _rope_dim(cfg.attention), cfg.rope_theta,
                                cfg.rope_scaling_cfg, cfg.max_position_embeddings)
        valid = (seg != 0).reshape(-1)
        h = self._last_trunk
        w_head = self.lm_head_weight(params).astype(compute_dtype)
        ids_k = seq_ctx.input_ids
        labels_k = shifted_labels
        weights_k = loss_weights
        losses, bals, zls, loads, idxs = [], [], [], [], []
        n_phys = params["mtp_layers"]["input_norm"].shape[0]
        for depth in range(cfg.mtp_num_layers):
            phys = min(depth, n_phys - 1)  # shared weights: one physical layer
            lp = jax.tree.map(lambda a: a[phys], params["mtp_layers"])
            ids_k = shift_for_mtp(ids_k, seg, fill=0)
            labels_k = shift_for_mtp(labels_k, seg, fill=-100)
            weights_k = shift_for_mtp(weights_k, seg, fill=0.0)
            next_embed = jnp.take(params["embed"]["w"], ids_k, axis=0).astype(compute_dtype)
            fused = mtp_fuse(cast_tree(lp, compute_dtype), h, next_embed, cfg.rms_norm_eps)
            h, (bal_k, zl_k, load_k, idx_k) = self._moe_layer_forward(
                fused, lp, cfg, cos, sin, seg, valid, sc, compute_dtype)
            normed = rms_norm(h, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                              cfg.rms_norm_type == "zero_centered").astype(compute_dtype)
            lm_k, _, _ = ce_loss(normed, w_head, labels_k, weights_k, global_denom,
                                 cfg.lm_loss_cfg, sc=sc)
            losses.append(lm_k)
            bals.append(bal_k); zls.append(zl_k); loads.append(load_k); idxs.append(idx_k)
        loss = cfg.mtp_loss_coef * sum(losses) / max(len(losses), 1)
        return loss, (jnp.stack(bals), jnp.stack(zls), jnp.stack(loads), jnp.stack(idxs))

    # ------------------------------------------------------------------
    def hf_key_map(self) -> dict:
        cfg = self.cfg
        base = super().hf_key_map()
        dense_mlp = base["layers"].pop("mlp")
        dense_part = base.pop("layers")
        off = cfg.first_k_dense_replace

        def shift(tree):
            """MoE stack index i -> HF layer index i + first_k_dense_replace."""
            if off == 0:
                return tree
            return jax.tree.map(
                lambda leaf: HFKey(leaf.template, leaf.transform, layer_offset=off),
                tree, is_leaf=lambda x: isinstance(x, HFKey),
            )

        moe_part = {
            "attn": self._mla_key_map() if isinstance(cfg.attention, MLAConfig) else dense_part["attn"],
            "input_norm": dense_part["input_norm"],
            "post_attn_norm": dense_part["post_attn_norm"],
            "router": {"w": HFKey("model.layers.{layer}.mlp.gate.weight", "linear")},
            "experts": (
                {
                    # qwen3_vl_moe fused layout: (E, H, 2F) gate|up halves and
                    # (E, F, H) down — already (in, out) per expert, no transpose
                    "gate_proj": HFKey("model.layers.{layer}.mlp.experts.gate_up_proj", "fused3d_half0"),
                    "up_proj": HFKey("model.layers.{layer}.mlp.experts.gate_up_proj", "fused3d_half1"),
                    "down_proj": HFKey("model.layers.{layer}.mlp.experts.down_proj"),
                }
                if cfg.hf_expert_format == "fused_3d" else
                {
                    "gate_proj": HFKey("model.layers.{layer}.mlp.experts.{expert}.gate_proj.weight", "expert_linear"),
                    "up_proj": HFKey("model.layers.{layer}.mlp.experts.{expert}.up_proj.weight", "expert_linear"),
                    "down_proj": HFKey("model.layers.{layer}.mlp.experts.{expert}.down_proj.weight", "expert_linear"),
                }
            ),
        }
        if cfg.router.router_type == "noaux":
            moe_part["router"]["e_score_correction_bias"] = HFKey(
                "model.layers.{layer}.mlp.gate.e_score_correction_bias"
            )
        if cfg.n_shared_experts > 0:
            moe_part["shared_experts"] = {
                "gate_proj": {"w": HFKey("model.layers.{layer}.mlp.shared_experts.gate_proj.weight", "linear")},
                "up_proj": {"w": HFKey("model.layers.{layer}.mlp.shared_experts.up_proj.weight", "linear")},
                "down_proj": {"w": HFKey("model.layers.{layer}.mlp.shared_experts.down_proj.weight", "linear")},
            }
        base["moe_layers"] = shift(moe_part)
        if cfg.first_k_dense_replace > 0:
            base["dense_layers"] = {**dense_part, "mlp": dense_mlp}
        return base


# ----------------------------------------------------------------------
# Qwen3 MoE presets (reference: xtuner/v1/model/moe/qwen3.py:53,137,174)
# ----------------------------------------------------------------------

from ..module.attention import MHAConfig  # noqa: E402


class Qwen3MoEConfig(MoEConfig):
    model_type: Optional[str] = "qwen3_moe"


def qwen3_moe_30b_a3() -> Qwen3MoEConfig:
    return Qwen3MoEConfig(
        vocab_size=151936,
        max_position_embeddings=40960,
        eos_token_id=151645,
        pad_token_id=151643,
        num_hidden_layers=48,
        hidden_size=2048,
        intermediate_size=6144,
        moe_intermediate_size=768,
        n_routed_experts=128,
        num_experts_per_tok=8,
        rms_norm_eps=1e-6,
        hidden_act="silu",
        rope_theta=1000000.0,
        balancing_loss_coef=0.001,
        router=GreedyRouterConfig(scoring_func="softmax", norm_topk_prob=True),
        attention=MHAConfig(num_attention_heads=32, num_key_value_heads=4, head_dim=128,
                            qk_norm=True),
    )


def qwen3_moe_235b_a22() -> Qwen3MoEConfig:
    cfg = qwen3_moe_30b_a3()
    return cfg.model_copy(update=dict(
        num_hidden_layers=94,
        hidden_size=4096,
        intermediate_size=12288,
        moe_intermediate_size=1536,
        attention=MHAConfig(num_attention_heads=64, num_key_value_heads=4, head_dim=128,
                            qk_norm=True),
    ))


def moe_config_from_hf(hf_cfg) -> Qwen3MoEConfig:
    head_dim = getattr(hf_cfg, "head_dim", None) or hf_cfg.hidden_size // hf_cfg.num_attention_heads
    return Qwen3MoEConfig(
        vocab_size=hf_cfg.vocab_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        eos_token_id=hf_cfg.eos_token_id if hf_cfg.eos_token_id is not None else 0,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        moe_intermediate_size=hf_cfg.moe_intermediate_size,
        n_routed_experts=hf_cfg.num_experts,
        num_experts_per_tok=hf_cfg.num_experts_per_tok,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        hidden_act=hf_cfg.hidden_act,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        tie_word_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        router=GreedyRouterConfig(norm_topk_prob=getattr(hf_cfg, "norm_topk_prob", True)),
        attention=MHAConfig(
            num_attention_heads=hf_cfg.num_attention_heads,
            num_key_value_heads=hf_cfg.num_key_value_heads,
            head_dim=head_dim,
            qk_norm=True,
        ),
    )
