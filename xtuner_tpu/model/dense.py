"""Dense decoder-only transformer.

Reference: xtuner/v1/model/dense/dense.py (Dense, 362 LoC) + presets
(qwen2.py, qwen3.py). TPU redesign: all decoder layers are *stacked* into one
pytree and iterated with `lax.scan` (one trace/compile regardless of depth)
with `jax.checkpoint` for per-layer rematerialisation — replacing the
reference's per-layer FSDP wrapping + checkpoint_wrapper
(dense/dense.py:187-305).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..checkpoint.spec import HFKey
from ..loss.ce_loss import ce_loss
from ..module.attention import mha_forward, mha_param_specs
from ..module.mla import MLAConfig, mla_forward, mla_param_specs
from ..module.mlp import mlp_forward, mlp_param_specs
from ..module.params import ParamSpec, cast_tree, stack_specs
from ..module.rope import _rope_dim, model_rope_cos_sin
from ..ops.rms_norm import rms_norm
from ..parallel.sharding import NULL_SHARD_CTX, ShardCtx
from .base import ModelOutputs, TransformerConfig


def _remat_policy(name: str):
    if name == "none":
        return "none"
    if name == "full":
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "save_attn":
        # save flash-attention outputs: backward never re-runs the attention
        # kernels (the highest-cost remat recompute), everything else recomputed
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if name == "save_out_lse":
        # save ONLY the flash kernel's (out, lse): the bwd kernels need
        # (q,k,v,out,lse,do) — q/k/v recompute via cheap projection GEMMs, but
        # the expensive forward attention kernel never re-runs. Memory:
        # ~Hq*Dv bf16 + Hq f32 per token per layer (~1/3 of save_attn_residuals)
        # => viable at 64k where the full residual set OOMs.
        return jax.checkpoint_policies.save_only_these_names(
            "attn_res_out", "attn_lse")
    if name == "save_out_lse_moe":
        # save_out_lse + the MoE/MLP block outputs: backward also skips the
        # expert-GEMM recompute at +H bf16 per token per layer
        return jax.checkpoint_policies.save_only_these_names(
            "attn_res_out", "attn_lse", "moe_out")
    if name == "save_attn_residuals_moe":
        # save_attn_residuals + MoE/MLP block outputs: backward re-runs
        # neither the attention kernels nor the expert GEMMs — the cheapest
        # backward when memory allows (short-seq / FFN-heavy shapes)
        return jax.checkpoint_policies.save_only_these_names(
            "attn_q", "attn_k", "attn_v", "attn_res_out", "attn_lse", "attn_out",
            "moe_out")
    if name == "save_attn_residuals_idx":
        # save_attn_residuals + the MoE dispatch index machinery (sort
        # outputs, inverse permutation, group sizes, routing decisions):
        # the backward skips recomputing the two 131k-row stable sorts,
        # the histogram, and the router GEMM/softmax/top_k per layer, at
        # ~10 MB per layer — the best train-step policy for MoE shapes
        # (docs/kernels.md "remat policies")
        return jax.checkpoint_policies.save_only_these_names(
            "attn_q", "attn_k", "attn_v", "attn_res_out", "attn_lse", "attn_out",
            "moe_sort_idx", "moe_token_idx", "moe_sorted_w", "moe_inv_pos",
            "moe_group_sizes", "moe_topk_w", "moe_topk_idx")
    if name == "save_attn_residuals":
        # save the flash kernel's residuals (q/k/v/out/lse): backward reuses
        # them instead of re-running the forward attention kernel; projections
        # and MLP still recompute. Memory: ~(2Hq+2Hkv+1)*L*D bf16 per layer.
        return jax.checkpoint_policies.save_only_these_names(
            "attn_q", "attn_k", "attn_v", "attn_res_out", "attn_lse", "attn_out")
    if name == "offload_attn":
        # long-context memory relief: park attention outputs in HOST memory
        # between fwd and bwd (reference utils/activation_offload.py)
        return jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["attn_out"],
            offload_src="device", offload_dst="pinned_host")
    raise ValueError(f"Unknown remat policy {name!r}")


def _is_dsa(attn_cfg) -> bool:
    from ..module.dsa import DSAConfig

    return isinstance(attn_cfg, DSAConfig)


def _attn_param_specs(cfg, lora_cfg=None):
    """Attention spec dispatch shared by Dense/MoE: DSA > MLA > MHA."""
    from ..module.dsa import dsa_param_specs

    if _is_dsa(cfg.attention):
        return dsa_param_specs(cfg.attention, cfg.hidden_size, cfg.init_scale)
    if isinstance(cfg.attention, MLAConfig):
        return mla_param_specs(cfg.attention, cfg.hidden_size, cfg.init_scale)
    return mha_param_specs(cfg.attention, cfg.hidden_size, cfg.init_scale, lora_cfg)


class DenseConfig(TransformerConfig):
    def build(self) -> "Dense":
        return Dense(self)


class Dense:
    """Pure-function model: `param_specs()` + `forward()` + `loss()`."""

    def __init__(self, cfg: DenseConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------
    def layer_param_specs(self) -> dict:
        cfg = self.cfg
        attn_specs = _attn_param_specs(cfg, cfg.lora_cfg)
        return {
            "attn": attn_specs,
            "mlp": mlp_param_specs(cfg.hidden_size, cfg.intermediate_size, cfg.init_scale,
                                   cfg.mlp_bias, cfg.lora_cfg),
            "input_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
            "post_attn_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }

    def param_specs(self) -> dict:
        cfg = self.cfg
        specs: dict = {
            "embed": {"w": ParamSpec((cfg.vocab_size, cfg.hidden_size), ("vocab", "embed_shard"), scale=cfg.init_scale)},
            "layers": stack_specs(self.layer_param_specs(), cfg.num_hidden_layers),
            "final_norm": ParamSpec((cfg.hidden_size,), (None,), init="ones"),
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"w": ParamSpec((cfg.hidden_size, cfg.vocab_size), ("embed_shard", "vocab"), scale=cfg.init_scale)}
        if cfg.rope_scaling_cfg is not None and cfg.rope_scaling_cfg.use_fope:
            from ..module.rope import _rope_dim as _rd, fope_param_specs

            specs["fope"] = fope_param_specs(_rd(cfg.attention), cfg.rope_theta,
                                             cfg.rope_scaling_cfg,
                                             cfg.max_position_embeddings)
        return specs

    # ------------------------------------------------------------------
    def _layer_forward(self, x, lp, cfg, cos, sin, segment_ids, sc, compute_dtype):
        from ..profiler.prober import probe

        lp = cast_tree(lp, compute_dtype)
        lora_s = cfg.lora_cfg.scaling if cfg.lora_cfg else 1.0
        x = probe("before_layer", x)
        # pin normed activations to the data layout (see model/moe.py note on
        # SPMD involuntary full remat with fsdp-sharded projection weights)
        h = sc(rms_norm(x, lp["input_norm"], cfg.rms_norm_eps,
                        cfg.rms_norm_type == "zero_centered"), "batch", "seq", None)
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
                            window=cfg.sliding_window if cfg.use_sliding_window else None,
                            attn_impl=cfg.attn_impl, lora_scaling=lora_s,
                            fp8_cfg=cfg.float8_cfg)
        h = probe("after_attn", h)
        x = x + h
        h = sc(rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps,
                        cfg.rms_norm_type == "zero_centered"), "batch", "seq", None)
        h = mlp_forward(lp["mlp"], h, cfg.hidden_act, lora_scaling=lora_s,
                        fp8_cfg=cfg.float8_cfg)
        x = x + h
        return sc(x, "batch", "seq", None), idx_loss

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
        """-> final hidden states (B, L, H) in compute dtype."""
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

        def layer_fn(x, lp):
            x, idx_loss = self._layer_forward(x, lp, cfg, cos, sin, segment_ids, sc,
                                              compute_dtype)
            return x, idx_loss

        policy = _remat_policy(remat)
        if policy != "none":
            layer_fn = jax.checkpoint(layer_fn, policy=policy, prevent_cse=False)
        ds = seq_ctx.deepstack_embeds
        if ds is not None:
            # Qwen3-VL deepstack: visual features from intermediate ViT layers
            # are added to the hidden states after each of the first n_ds text
            # layers (reference dense/qwen3vl_text.py:66-75). `ds` arrives
            # pre-scattered to (n_ds, B, L, H) (zeros at non-visual positions)
            # so the injection is a plain add inside a short second scan.
            n_ds = ds.shape[0]
            head = jax.tree.map(lambda a: a[:n_ds], params["layers"])
            tail = jax.tree.map(lambda a: a[n_ds:], params["layers"])

            def layer_ds_fn(x, xs):
                lp, add = xs
                x, idx = layer_fn(x, lp)
                return x + add.astype(x.dtype), idx

            x, idx0 = jax.lax.scan(layer_ds_fn, x, (head, ds))
            x, idx1 = jax.lax.scan(layer_fn, x, tail)
            idx_losses = jnp.concatenate([idx0, idx1])
        else:
            x, idx_losses = jax.lax.scan(layer_fn, x, params["layers"])
        # DSA lightning-indexer distillation loss (the indexer's only gradient
        # path, reference dsa_mla.py); zero for non-DSA attention
        self._last_idx_loss = jnp.sum(idx_losses)
        x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                     cfg.rms_norm_type == "zero_centered")
        return x.astype(compute_dtype)

    def lm_head_weight(self, params):
        if self.cfg.tie_word_embeddings:
            return params["embed"]["w"].T
        return params["lm_head"]["w"]

    def loss(self, params, seq_ctx, shifted_labels, loss_weights, global_denom,
             sc: ShardCtx = NULL_SHARD_CTX, compute_dtype=jnp.bfloat16,
             remat: str = "full") -> ModelOutputs:
        hidden = self.forward(params, seq_ctx, sc, compute_dtype, remat)
        w = self.lm_head_weight(params).astype(compute_dtype)
        loss, sum_ce, num_tokens = ce_loss(hidden, w, shifted_labels, loss_weights,
                                           global_denom, self.cfg.lm_loss_cfg, sc=sc)
        out = ModelOutputs(loss=loss, sum_ce=sum_ce, num_tokens=num_tokens)
        if _is_dsa(self.cfg.attention):
            out.dsa_index_loss = self.cfg.dsa_index_loss_coef * self._last_idx_loss
        return out

    # ------------------------------------------------------------------
    # HF interop (reference: to_hf_key_list converters, dense presets)
    # ------------------------------------------------------------------
    def _mlp_key_map(self) -> dict:
        cfg = self.cfg
        mlp = {
            "gate_proj": {"w": HFKey("model.layers.{layer}.mlp.gate_proj.weight", "linear")},
            "up_proj": {"w": HFKey("model.layers.{layer}.mlp.up_proj.weight", "linear")},
            "down_proj": {"w": HFKey("model.layers.{layer}.mlp.down_proj.weight", "linear")},
        }
        if cfg.lora_cfg is not None:
            for name in list(mlp):
                if name in cfg.lora_cfg.target_modules:
                    mlp[name]["lora_a"] = HFKey("<random>")
                    mlp[name]["lora_b"] = HFKey("<random>")
                    if cfg.lora_cfg.qlora:
                        tmpl = mlp[name].pop("w").template
                        mlp[name]["w_q4"] = HFKey(tmpl, "nf4_pack")
                        mlp[name]["w_absmax"] = HFKey(tmpl, "nf4_scale")
        return mlp

    def merge_lora(self, params):
        from ..module.lora import merge_lora

        if self.cfg.lora_cfg is None:
            return params
        return merge_lora(params, self.cfg.lora_cfg.scaling)

    def param_labels(self, params):
        """'train'/'freeze' labels for the optimizer (LoRA freezes the base)."""
        from ..module.lora import lora_param_labels

        if self.cfg.lora_cfg is None:
            return jax.tree.map(lambda _: "train", params)
        return lora_param_labels(params, self.cfg.lora_cfg)
    def _mla_key_map(self) -> dict:
        cfg = self.cfg
        attn: dict = {
            "kv_a_proj": {"w": HFKey("model.layers.{layer}.self_attn.kv_a_proj_with_mqa.weight", "linear")},
            "kv_a_norm": HFKey("model.layers.{layer}.self_attn.kv_a_layernorm.weight"),
            "kv_b_proj": {"w": HFKey("model.layers.{layer}.self_attn.kv_b_proj.weight", "linear")},
            "o_proj": {"w": HFKey("model.layers.{layer}.self_attn.o_proj.weight", "linear")},
        }
        if cfg.attention.q_lora_rank is not None:
            attn["q_a_proj"] = {"w": HFKey("model.layers.{layer}.self_attn.q_a_proj.weight", "linear")}
            attn["q_a_norm"] = HFKey("model.layers.{layer}.self_attn.q_a_layernorm.weight")
            attn["q_b_proj"] = {"w": HFKey("model.layers.{layer}.self_attn.q_b_proj.weight", "linear")}
        else:
            attn["q_proj"] = {"w": HFKey("model.layers.{layer}.self_attn.q_proj.weight", "linear")}
        return attn

    def hf_key_map(self) -> dict:
        cfg = self.cfg
        if isinstance(cfg.attention, MLAConfig):
            attn = self._mla_key_map()
            keymap: dict = {
                "embed": {"w": HFKey("model.embed_tokens.weight")},
                "layers": {
                    "attn": attn,
                    "mlp": self._mlp_key_map(),
                    "input_norm": HFKey("model.layers.{layer}.input_layernorm.weight"),
                    "post_attn_norm": HFKey("model.layers.{layer}.post_attention_layernorm.weight"),
                },
                "final_norm": HFKey("model.norm.weight"),
            }
            if not cfg.tie_word_embeddings:
                keymap["lm_head"] = {"w": HFKey("lm_head.weight", "linear")}
            return keymap
        attn: dict = {
            "q_proj": {"w": HFKey("model.layers.{layer}.self_attn.q_proj.weight", "linear")},
            "k_proj": {"w": HFKey("model.layers.{layer}.self_attn.k_proj.weight", "linear")},
            "v_proj": {"w": HFKey("model.layers.{layer}.self_attn.v_proj.weight", "linear")},
            "o_proj": {"w": HFKey("model.layers.{layer}.self_attn.o_proj.weight", "linear")},
        }
        if cfg.lora_cfg is not None:
            for name in list(attn):
                if name in cfg.lora_cfg.target_modules:
                    attn[name]["lora_a"] = HFKey("<random>")
                    attn[name]["lora_b"] = HFKey("<random>")
                    if cfg.lora_cfg.qlora:
                        tmpl = attn[name].pop("w").template
                        attn[name]["w_q4"] = HFKey(tmpl, "nf4_pack")
                        attn[name]["w_absmax"] = HFKey(tmpl, "nf4_scale")
        if cfg.attention.qkv_bias:
            attn["q_proj"]["b"] = HFKey("model.layers.{layer}.self_attn.q_proj.bias")
            attn["k_proj"]["b"] = HFKey("model.layers.{layer}.self_attn.k_proj.bias")
            attn["v_proj"]["b"] = HFKey("model.layers.{layer}.self_attn.v_proj.bias")
        if cfg.attention.o_bias:
            attn["o_proj"]["b"] = HFKey("model.layers.{layer}.self_attn.o_proj.bias")
        if cfg.attention.qk_norm:
            attn["q_norm"] = HFKey("model.layers.{layer}.self_attn.q_norm.weight")
            attn["k_norm"] = HFKey("model.layers.{layer}.self_attn.k_norm.weight")
        if cfg.attention.with_sinks:
            attn["sinks"] = HFKey("model.layers.{layer}.self_attn.sinks")
        keymap: dict = {
            "embed": {"w": HFKey("model.embed_tokens.weight")},
            "layers": {
                "attn": attn,
                "mlp": self._mlp_key_map(),
                "input_norm": HFKey("model.layers.{layer}.input_layernorm.weight"),
                "post_attn_norm": HFKey("model.layers.{layer}.post_attention_layernorm.weight"),
            },
            "final_norm": HFKey("model.norm.weight"),
        }
        if cfg.mlp_bias:
            keymap["layers"]["mlp"]["gate_proj"]["b"] = HFKey("model.layers.{layer}.mlp.gate_proj.bias")
            keymap["layers"]["mlp"]["up_proj"]["b"] = HFKey("model.layers.{layer}.mlp.up_proj.bias")
            keymap["layers"]["mlp"]["down_proj"]["b"] = HFKey("model.layers.{layer}.mlp.down_proj.bias")
        if not cfg.tie_word_embeddings:
            keymap["lm_head"] = {"w": HFKey("lm_head.weight", "linear")}
        if cfg.rope_scaling_cfg is not None and cfg.rope_scaling_cfg.use_fope:
            keymap["fope"] = {"sin_coef": HFKey("model.rotary_emb.sin_coef"),
                              "cos_coef": HFKey("model.rotary_emb.cos_coef")}
        return keymap
