"""VLM compose model: vision tower + projector + language model.

Reference: xtuner/v1/model/compose/base.py (BaseComposeModel :70 — per-module
fully_shard, freezing :82-99, HF key remapping :63) and the InternS1/InternVL
assembly (intern_s1/modeling_intern_s1.py). TPU design: one params tree
{vision, projector, language}; the forward embeds text tokens, runs the ViT
over the batch's image tiles, projects, and scatters vision embeds into the
image-context positions — then the language model consumes inputs_embeds.
Freezing reuses the LoRA label machinery (stop_gradient + optimizer mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from pydantic import BaseModel as PydanticBaseModel, ConfigDict

from ..checkpoint.spec import HFKey
from ..parallel.sharding import NULL_SHARD_CTX, ShardCtx
from .base import ModelOutputs, TransformerConfig
from .vision import (ProjectorConfig, ViTConfig, projector_forward, projector_param_specs,
                     vit_forward, vit_param_specs)


class ComposeConfig(PydanticBaseModel):
    """Analog of the reference compose configs (InternVL/InternS1)."""

    model_config = ConfigDict(extra="forbid")
    vision_cfg: ViTConfig = ViTConfig()
    text_cfg: TransformerConfig
    image_context_token_id: int  # positions of this token receive vision embeds
    freeze_vision: bool = False
    freeze_language: bool = False
    freeze_projector: bool = False

    @property
    def projector_cfg(self) -> ProjectorConfig:
        s = int(1 / self.vision_cfg.downsample_ratio)
        return ProjectorConfig(
            in_dim=self.vision_cfg.hidden_size * s * s,
            out_dim=self.text_cfg.hidden_size,
        )

    @property
    def tokens_per_tile(self) -> int:
        return self.vision_cfg.tokens_per_tile

    # engine compatibility
    @property
    def lm_loss_cfg(self):
        return self.text_cfg.lm_loss_cfg

    @property
    def lora_cfg(self):
        return None

    @property
    def eos_token_id(self):
        return self.text_cfg.eos_token_id

    def build(self) -> "ComposeModel":
        return ComposeModel(self)


class ComposeModel:
    def __init__(self, cfg: ComposeConfig):
        self.cfg = cfg
        self.language = cfg.text_cfg.build()

    def param_specs(self) -> dict:
        return {
            "vision": vit_param_specs(self.cfg.vision_cfg),
            "projector": projector_param_specs(self.cfg.projector_cfg),
            "language": self.language.param_specs(),
        }

    # ------------------------------------------------------------------
    def _fuse_vision(self, params, seq_ctx, compute_dtype):
        """Text embeds with vision embeds scattered at image-context tokens."""
        lang = params["language"]
        embeds = jnp.take(lang["embed"]["w"], seq_ctx.input_ids, axis=0).astype(compute_dtype)
        if seq_ctx.pixel_values is None:
            return embeds
        vis = vit_forward(params["vision"], self.cfg.vision_cfg, seq_ctx.pixel_values,
                          compute_dtype)  # (T, tok, vit_out)
        vis = projector_forward(params["projector"], self.cfg.projector_cfg, vis,
                                compute_dtype)  # (T, tok, H)
        vis_flat = vis.reshape(-1, vis.shape[-1])
        b, l = seq_ctx.input_ids.shape
        mask = (seq_ctx.input_ids == self.cfg.image_context_token_id).reshape(-1)
        # k-th image-context position <- k-th vision token (row-major over batch),
        # matching the collator's tile ordering
        dest = jnp.cumsum(mask) - 1  # index into vis_flat for each position
        dest = jnp.clip(dest, 0, vis_flat.shape[0] - 1)
        gathered = jnp.take(vis_flat, dest, axis=0)
        out = jnp.where(mask[:, None], gathered, embeds.reshape(b * l, -1))
        return out.reshape(b, l, -1)

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
        embeds = self._fuse_vision(params, seq_ctx, compute_dtype)
        lang_ctx = seq_ctx.replace(inputs_embeds=embeds)
        return self.language.forward(params["language"], lang_ctx, sc, compute_dtype, remat)

    def lm_head_weight(self, params):
        return self.language.lm_head_weight(params["language"])

    def loss(self, params, seq_ctx, shifted_labels, loss_weights, global_denom,
             sc: ShardCtx = NULL_SHARD_CTX, compute_dtype=jnp.bfloat16,
             remat: str = "full") -> ModelOutputs:
        from ..loss.ce_loss import ce_loss

        hidden = self.forward(params, seq_ctx, sc, compute_dtype, remat)
        w = self.lm_head_weight(params).astype(compute_dtype)
        loss, sum_ce, num_tokens = ce_loss(hidden, w, shifted_labels, loss_weights,
                                           global_denom, self.cfg.text_cfg.lm_loss_cfg, sc=sc)
        return ModelOutputs(loss=loss, sum_ce=sum_ce, num_tokens=num_tokens)

    # ------------------------------------------------------------------
    def param_labels(self, params_or_specs):
        """train/freeze labels per submodule (reference freezing :82-99)."""
        cfg = self.cfg

        def label_tree(tree, frozen):
            return jax.tree.map(lambda _: "freeze" if frozen else "train", tree)

        return {
            "vision": label_tree(params_or_specs["vision"], cfg.freeze_vision),
            "projector": label_tree(params_or_specs["projector"], cfg.freeze_projector),
            "language": label_tree(params_or_specs["language"], cfg.freeze_language),
        }

    def merge_lora(self, params):
        return params

    def hf_key_map(self) -> dict:
        """InternVL-flavoured key layout; language keys get the
        'language_model.' prefix (reference to_hf_key_list_wrapper :63)."""
        lang = self.language.hf_key_map()

        def prefix(leaf: HFKey) -> HFKey:
            return HFKey("language_model." + leaf.template, leaf.transform,
                         layer_offset=leaf.layer_offset)

        lang = jax.tree.map(prefix, lang, is_leaf=lambda x: isinstance(x, HFKey))
        n_blocks = self.cfg.vision_cfg.num_hidden_layers
        vis = {
            "patch_embed": {"w": HFKey("vision_tower.patch_embed.weight", "linear"),
                            "b": HFKey("vision_tower.patch_embed.bias")},
            "pos_embed": HFKey("vision_tower.pos_embed"),
            "cls_token": HFKey("vision_tower.cls_token"),
            "blocks": {
                "norm1": {"w": HFKey("vision_tower.blocks.{layer}.norm1.weight"),
                          "b": HFKey("vision_tower.blocks.{layer}.norm1.bias")},
                "attn": {
                    "qkv": {"w": HFKey("vision_tower.blocks.{layer}.attn.qkv.weight", "linear"),
                            "b": HFKey("vision_tower.blocks.{layer}.attn.qkv.bias")},
                    "proj": {"w": HFKey("vision_tower.blocks.{layer}.attn.proj.weight", "linear"),
                             "b": HFKey("vision_tower.blocks.{layer}.attn.proj.bias")},
                },
                "norm2": {"w": HFKey("vision_tower.blocks.{layer}.norm2.weight"),
                          "b": HFKey("vision_tower.blocks.{layer}.norm2.bias")},
                "mlp": {
                    "fc1": {"w": HFKey("vision_tower.blocks.{layer}.mlp.fc1.weight", "linear"),
                            "b": HFKey("vision_tower.blocks.{layer}.mlp.fc1.bias")},
                    "fc2": {"w": HFKey("vision_tower.blocks.{layer}.mlp.fc2.weight", "linear"),
                            "b": HFKey("vision_tower.blocks.{layer}.mlp.fc2.bias")},
                },
                "ls1": HFKey("vision_tower.blocks.{layer}.ls1"),
                "ls2": HFKey("vision_tower.blocks.{layer}.ls2"),
            },
        }
        if not self.cfg.vision_cfg.use_cls_token:
            vis.pop("cls_token")
        proj = {
            "norm": {"w": HFKey("multi_modal_projector.layer_norm.weight"),
                     "b": HFKey("multi_modal_projector.layer_norm.bias")},
            "fc1": {"w": HFKey("multi_modal_projector.linear_1.weight", "linear"),
                    "b": HFKey("multi_modal_projector.linear_1.bias")},
            "fc2": {"w": HFKey("multi_modal_projector.linear_2.weight", "linear"),
                    "b": HFKey("multi_modal_projector.linear_2.bias")},
        }
        return {"vision": vis, "projector": proj, "language": lang}
