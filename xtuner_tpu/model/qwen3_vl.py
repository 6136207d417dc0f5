"""Qwen3-VL: windowless ViT with deepstack features + interleaved-MRoPE LLM.

Reference: xtuner/v1/model/compose/qwen3_vl/ (modeling_vision.py 552 LoC,
modeling_projector.py, modeling_qwen3_vl.py, qwen3_vl_config.py) and the HF
Qwen3VL modeling for numeric parity. TPU redesign:

- The torch vision tower loops Python blocks and computes per-image rotary /
  pos-embed interpolation with data-dependent shapes (modeling_vision.py:372-464).
  Here ALL data-dependent geometry (bilinear pos-embed interpolation indices +
  weights, 2D rotary positions, per-frame segment ids) is precomputed on the
  HOST by the collator (`vision_geometry`), so the jitted forward is pure
  static-shape gathers + matmuls: patchify-as-matmul onto the MXU, blocks under
  `lax.scan`, varlen bidirectional flash attention with segment ids.
- Deepstack features (hidden states after ViT layers `deepstack_visual_indexes`)
  fall out of a *segmented* scan over the stacked block params — no per-layer
  Python loop, no (depth, P, H) buffer.
- The text model consumes `deepstack_embeds` pre-scattered to (n_ds, B, L, H)
  and interleaved MRoPE positions (see model/dense.py + module/rope.py).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel as PydanticBaseModel, ConfigDict

from ..checkpoint.spec import HFKey
from ..module.params import ParamSpec, cast_tree, stack_specs
from ..ops.act_fn import get_act_fn
from ..ops.attention import attention
from ..parallel.sharding import NULL_SHARD_CTX, ShardCtx
from .base import ModelOutputs, TransformerConfig
from .vision import layer_norm


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------
class Qwen3VLVisionConfig(PydanticBaseModel):
    """Mirrors reference Qwen3VLVisionConfig (qwen3_vl_config.py:21-57)."""

    model_config = ConfigDict(extra="forbid")
    in_channels: int = 3
    depth: int = 27
    hidden_size: int = 1152
    num_attention_heads: int = 16
    intermediate_size: int = 4304
    hidden_act: str = "gelu_pytorch_tanh"
    patch_size: int = 16
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: list[int] = [8, 16, 24]
    layer_norm_eps: float = 1e-6
    initializer_range: float = 0.02
    attn_impl: Optional[str] = None  # None = backend default

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_grid_per_side(self) -> int:
        return int(self.num_position_embeddings ** 0.5)


class Qwen3VLProjectorConfig(PydanticBaseModel):
    """Mirrors reference Qwen3VLProjectorConfig (qwen3_vl_config.py:60-77)."""

    model_config = ConfigDict(extra="forbid")
    vision_hidden_size: int = 1152
    text_hidden_size: int = 2048
    spatial_merge_size: int = 2
    deepstack_visual_indexes: list[int] = [8, 16, 24]

    @property
    def merged_size(self) -> int:
        return self.vision_hidden_size * self.spatial_merge_size ** 2


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------
def qwen3vl_vision_param_specs(cfg: Qwen3VLVisionConfig) -> dict:
    h, f, s = cfg.hidden_size, cfg.intermediate_size, cfg.initializer_range
    block = {
        "norm1": {"w": ParamSpec((h,), (None,), init="ones"),
                  "b": ParamSpec((h,), (None,), init="zeros")},
        "attn": {
            "qkv": {"w": ParamSpec((h, 3 * h), ("embed_shard", "heads"), scale=s),
                    "b": ParamSpec((3 * h,), ("heads",), init="zeros")},
            "proj": {"w": ParamSpec((h, h), ("heads", "embed_shard"), scale=s),
                     "b": ParamSpec((h,), (None,), init="zeros")},
        },
        "norm2": {"w": ParamSpec((h,), (None,), init="ones"),
                  "b": ParamSpec((h,), (None,), init="zeros")},
        "mlp": {
            "fc1": {"w": ParamSpec((h, f), ("embed_shard", "mlp"), scale=s),
                    "b": ParamSpec((f,), ("mlp",), init="zeros")},
            "fc2": {"w": ParamSpec((f, h), ("mlp", "embed_shard"), scale=s),
                    "b": ParamSpec((h,), (None,), init="zeros")},
        },
    }
    return {
        "patch_embed": {"w": ParamSpec((cfg.patch_dim, h), (None, "embed_shard"), scale=s),
                        "b": ParamSpec((h,), (None,), init="zeros")},
        "pos_embed": ParamSpec((cfg.num_position_embeddings, h), (None, None), scale=s),
        "blocks": stack_specs(block, cfg.depth),
    }


def _vision_block(lp, cfg: Qwen3VLVisionConfig, x, cos, sin, segment_ids, sc: ShardCtx):
    """One ViT block (HF Qwen3VLVisionBlock): LN -> attn -> LN -> MLP,
    bidirectional varlen attention over per-frame segments."""
    p, n, h = 1, x.shape[0], cfg.hidden_size
    nh, d = cfg.num_attention_heads, cfg.head_dim
    a = lp["attn"]
    hs = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], cfg.layer_norm_eps)
    qkv = (hs @ a["qkv"]["w"] + a["qkv"]["b"]).reshape(n, 3, nh, d)
    q, k, v = qkv[:, 0][None], qkv[:, 1][None], qkv[:, 2][None]  # (1, P, nh, d)
    # fp32 rotation, rotate_half convention (HF apply_rotary_pos_emb_vision)
    from ..ops.rotary import apply_rotary_emb

    q, k = apply_rotary_emb(q, k, cos[None], sin[None])
    o = attention(q, k, v, segment_ids[None], causal=False,
                  impl=cfg.attn_impl, sc=sc)
    o = o.reshape(n, nh * d)
    x = x + (o @ a["proj"]["w"] + a["proj"]["b"])
    hs = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], cfg.layer_norm_eps)
    hs = get_act_fn(cfg.hidden_act)(hs @ lp["mlp"]["fc1"]["w"] + lp["mlp"]["fc1"]["b"])
    x = x + (hs @ lp["mlp"]["fc2"]["w"] + lp["mlp"]["fc2"]["b"])
    return sc(x, "vis_patch", None)


def qwen3vl_vision_forward(params, cfg: Qwen3VLVisionConfig, seq_ctx,
                           sc: ShardCtx = NULL_SHARD_CTX,
                           compute_dtype=jnp.bfloat16):
    """patches (P, patch_dim) + host geometry -> (final (P, H), deepstack
    features list[(P, H)]) — features taken AFTER blocks at
    `deepstack_visual_indexes` (HF modeling: layer_num in indexes)."""
    patches = seq_ctx.pixel_values.astype(compute_dtype)
    interp_idx = seq_ctx.vision_pos_interp_idx  # (P, 4) int32
    interp_w = seq_ctx.vision_pos_interp_w  # (P, 4) fp32
    rot_pos = seq_ctx.vision_rot_pos  # (P, 2) int32
    segment_ids = seq_ctx.vision_segment_ids  # (P,) int32

    x = patches @ params["patch_embed"]["w"].astype(compute_dtype) \
        + params["patch_embed"]["b"].astype(compute_dtype)
    # bilinear pos-embed interpolation: 4 gathers + weighted sum (the host
    # precomputed indices/weights; reference fast_pos_embed_interpolate)
    pe = params["pos_embed"].astype(jnp.float32)  # (n_pos, H)
    pos = jnp.einsum("pkh,pk->ph", pe[interp_idx], interp_w.astype(jnp.float32))
    x = x + pos.astype(compute_dtype)
    # patch dim sharded over ALL data axes (reference shards the vision tower
    # sequence across SP ranks, modeling_vision.py:469-492); GSPMD inserts the
    # gathers at the text-scatter boundary
    x = sc(x, "vis_patch", None)

    # 2D rotary table: head_dim//4 frequencies per (row, col) axis
    # (HF Qwen3VLVisionRotaryEmbedding(head_dim // 2) -> rot_pos_emb)
    d4 = cfg.head_dim // 4
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, d4, dtype=jnp.float32) / d4))
    freqs = rot_pos.astype(jnp.float32)[:, :, None] * inv_freq  # (P, 2, d4)
    rot = freqs.reshape(-1, 2 * d4)  # (P, head_dim//2)
    emb = jnp.concatenate([rot, rot], axis=-1)  # (P, head_dim)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    def block_fn(x, lp):
        lp = cast_tree(lp, compute_dtype)
        return _vision_block(lp, cfg, x, cos, sin, segment_ids, sc), None

    block_fn = jax.checkpoint(block_fn, prevent_cse=False)

    # segmented scan: split the stacked block params at the deepstack indexes
    # so intermediate hidden states surface without a per-layer Python loop
    bounds = [i + 1 for i in cfg.deepstack_visual_indexes]
    starts = [0] + bounds
    ends = bounds + [cfg.depth]
    deepstack: List[jax.Array] = []
    for si, (s, e) in enumerate(zip(starts, ends)):
        if e > s:
            seg = jax.tree.map(lambda a: a[s:e], params["blocks"])
            x, _ = jax.lax.scan(block_fn, x, seg)
        if si < len(bounds):
            deepstack.append(x)
    return x, deepstack


# ---------------------------------------------------------------------------
# projector (patch merger + deepstack mergers)
# ---------------------------------------------------------------------------
def _merger_specs(cfg: Qwen3VLProjectorConfig, postshuffle: bool) -> dict:
    m, s = cfg.merged_size, 0.02
    norm_dim = m if postshuffle else cfg.vision_hidden_size
    return {
        "norm": {"w": ParamSpec((norm_dim,), (None,), init="ones"),
                 "b": ParamSpec((norm_dim,), (None,), init="zeros")},
        "fc1": {"w": ParamSpec((m, m), ("embed_shard", "mlp"), scale=s),
                "b": ParamSpec((m,), ("mlp",), init="zeros")},
        "fc2": {"w": ParamSpec((m, cfg.text_hidden_size), ("mlp", "embed_shard"), scale=s),
                "b": ParamSpec((cfg.text_hidden_size,), (None,), init="zeros")},
    }


def qwen3vl_projector_param_specs(cfg: Qwen3VLProjectorConfig) -> dict:
    return {
        "merger": _merger_specs(cfg, postshuffle=False),
        "deepstack_mergers": stack_specs(
            _merger_specs(cfg, postshuffle=True), len(cfg.deepstack_visual_indexes)),
    }


def _merger_forward(p, cfg: Qwen3VLProjectorConfig, x, postshuffle: bool,
                    compute_dtype=jnp.bfloat16):
    """(P, Hv) -> (P / merge^2, text_hidden). Spatial merge is a plain reshape
    because patches arrive in merge-block order (see preprocess_image)."""
    p = cast_tree(p, compute_dtype)
    m = cfg.merged_size
    if postshuffle:
        x = layer_norm(x.reshape(-1, m), p["norm"]["w"], p["norm"]["b"])
    else:
        x = layer_norm(x, p["norm"]["w"], p["norm"]["b"]).reshape(-1, m)
    x = jax.nn.gelu(x @ p["fc1"]["w"] + p["fc1"]["b"], approximate=False)
    return x @ p["fc2"]["w"] + p["fc2"]["b"]


# ---------------------------------------------------------------------------
# compose model
# ---------------------------------------------------------------------------
class Qwen3VLConfig(PydanticBaseModel):
    """Analog of reference Qwen3VLBaseConfig (qwen3_vl_config.py:80-117)."""

    model_config = ConfigDict(extra="forbid")
    vision_cfg: Qwen3VLVisionConfig = Qwen3VLVisionConfig()
    text_cfg: Any  # DenseConfig or MoEConfig (with rope_type=qwen3_vl)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    freeze_vision: bool = False
    freeze_projector: bool = False
    freeze_language: bool = False

    @property
    def projector_cfg(self) -> Qwen3VLProjectorConfig:
        v = self.vision_cfg
        return Qwen3VLProjectorConfig(
            vision_hidden_size=v.hidden_size,
            text_hidden_size=self.text_cfg.hidden_size,
            spatial_merge_size=v.spatial_merge_size,
            deepstack_visual_indexes=list(v.deepstack_visual_indexes),
        )

    # engine compatibility surface (cf. model/compose.py)
    @property
    def lm_loss_cfg(self):
        return self.text_cfg.lm_loss_cfg

    @property
    def lora_cfg(self):
        return None

    @property
    def eos_token_id(self):
        return self.text_cfg.eos_token_id

    @property
    def router(self):
        return getattr(self.text_cfg, "router", None)

    def build(self) -> "Qwen3VLModel":
        return Qwen3VLModel(self)


class Qwen3VLModel:
    def __init__(self, cfg: Qwen3VLConfig):
        self.cfg = cfg
        self.language = cfg.text_cfg.build()

    def param_specs(self) -> dict:
        return {
            "vision": qwen3vl_vision_param_specs(self.cfg.vision_cfg),
            "projector": qwen3vl_projector_param_specs(self.cfg.projector_cfg),
            "language": self.language.param_specs(),
        }

    # ------------------------------------------------------------------
    def _prepare_llm_inputs(self, params, seq_ctx, sc, compute_dtype):
        """Text embeds with ViT features scattered at image tokens + the
        deepstack adds, pre-scattered to (n_ds, B, L, H) (reference
        modeling_qwen3_vl.py:146-203 without the SP all-gather dance —
        GSPMD reshapes the gathers itself)."""
        lang = params["language"]
        embeds = jnp.take(lang["embed"]["w"], seq_ctx.input_ids, axis=0).astype(compute_dtype)
        if seq_ctx.pixel_values is None:
            return embeds, None
        pcfg = self.cfg.projector_cfg
        vis, ds_feats = qwen3vl_vision_forward(
            params["vision"], self.cfg.vision_cfg, seq_ctx, sc, compute_dtype)
        main = _merger_forward(params["projector"]["merger"], pcfg, vis,
                               postshuffle=False, compute_dtype=compute_dtype)
        ds = [
            _merger_forward(jax.tree.map(lambda a: a[i], params["projector"]["deepstack_mergers"]),
                            pcfg, f, postshuffle=True, compute_dtype=compute_dtype)
            for i, f in enumerate(ds_feats)
        ]
        b, l = seq_ctx.input_ids.shape
        if seq_ctx.image_token_mask is not None:
            mask = seq_ctx.image_token_mask.reshape(-1)
        else:
            flat_ids = seq_ctx.input_ids.reshape(-1)
            mask = (flat_ids == self.cfg.image_token_id) | (flat_ids == self.cfg.video_token_id)
        # k-th visual position <- k-th merged vision token (row-major over the
        # batch; the collator lays patches out in exactly this order)
        dest = jnp.clip(jnp.cumsum(mask) - 1, 0, main.shape[0] - 1)
        embeds = jnp.where(mask[:, None], jnp.take(main, dest, axis=0),
                           embeds.reshape(b * l, -1)).reshape(b, l, -1)
        if not ds:  # deepstack disabled (Qwen3.5-VL default)
            return embeds, None
        ds_scattered = jnp.stack([
            jnp.where(mask[:, None], jnp.take(d, dest, axis=0), 0.0).reshape(b, l, -1)
            for d in ds
        ])
        return embeds, ds_scattered

    def forward(self, params, seq_ctx, sc: ShardCtx = NULL_SHARD_CTX,
                compute_dtype=jnp.bfloat16, remat: str = "full"):
        embeds, ds = self._prepare_llm_inputs(params, seq_ctx, sc, compute_dtype)
        lang_ctx = seq_ctx.replace(inputs_embeds=embeds, deepstack_embeds=ds,
                                   pixel_values=None)
        return self.language.forward(params["language"], lang_ctx, sc, compute_dtype, remat)

    def lm_head_weight(self, params):
        return self.language.lm_head_weight(params["language"])

    def loss(self, params, seq_ctx, shifted_labels, loss_weights, global_denom,
             sc: ShardCtx = NULL_SHARD_CTX, compute_dtype=jnp.bfloat16,
             remat: str = "full") -> ModelOutputs:
        embeds, ds = self._prepare_llm_inputs(params, seq_ctx, sc, compute_dtype)
        lang_ctx = seq_ctx.replace(inputs_embeds=embeds, deepstack_embeds=ds,
                                   pixel_values=None)
        return self.language.loss(params["language"], lang_ctx, shifted_labels,
                                  loss_weights, global_denom, sc, compute_dtype, remat)

    # ------------------------------------------------------------------
    def param_labels(self, params_or_specs):
        cfg = self.cfg

        def label(tree, frozen):
            return jax.tree.map(lambda _: "freeze" if frozen else "train", tree)

        return {
            "vision": label(params_or_specs["vision"], cfg.freeze_vision),
            "projector": label(params_or_specs["projector"], cfg.freeze_projector),
            "language": label(params_or_specs["language"], cfg.freeze_language),
        }

    def merge_lora(self, params):
        return params

    # ------------------------------------------------------------------
    def hf_key_map(self) -> dict:
        """HF Qwen3VLForConditionalGeneration layout: vision under
        `model.visual.*`, text under `model.language_model.*`, `lm_head` top."""
        vcfg = self.cfg.vision_cfg

        def vis_prefix(leaf: HFKey) -> HFKey:
            return HFKey("model.visual." + leaf.template, leaf.transform,
                         layer_offset=leaf.layer_offset)

        def lang_prefix(leaf: HFKey) -> HFKey:
            t = leaf.template
            if t.startswith("model."):
                t = "model.language_model." + t[len("model."):]
            return HFKey(t, leaf.transform, layer_offset=leaf.layer_offset,
                         layer_stride=leaf.layer_stride,
                         fuse_dim=leaf.fuse_dim, fuse_start=leaf.fuse_start,
                         fuse_size=leaf.fuse_size)

        d = vcfg.patch_dim
        conv_dims = f"{vcfg.in_channels},{vcfg.temporal_patch_size},{vcfg.patch_size},{vcfg.patch_size}"
        vis = {
            "patch_embed": {"w": HFKey("patch_embed.proj.weight", f"conv3d:{conv_dims}"),
                            "b": HFKey("patch_embed.proj.bias")},
            "pos_embed": HFKey("pos_embed.weight"),
            "blocks": {
                "norm1": {"w": HFKey("blocks.{layer}.norm1.weight"),
                          "b": HFKey("blocks.{layer}.norm1.bias")},
                "attn": {
                    "qkv": {"w": HFKey("blocks.{layer}.attn.qkv.weight", "linear"),
                            "b": HFKey("blocks.{layer}.attn.qkv.bias")},
                    "proj": {"w": HFKey("blocks.{layer}.attn.proj.weight", "linear"),
                             "b": HFKey("blocks.{layer}.attn.proj.bias")},
                },
                "norm2": {"w": HFKey("blocks.{layer}.norm2.weight"),
                          "b": HFKey("blocks.{layer}.norm2.bias")},
                "mlp": {
                    "fc1": {"w": HFKey("blocks.{layer}.mlp.linear_fc1.weight", "linear"),
                            "b": HFKey("blocks.{layer}.mlp.linear_fc1.bias")},
                    "fc2": {"w": HFKey("blocks.{layer}.mlp.linear_fc2.weight", "linear"),
                            "b": HFKey("blocks.{layer}.mlp.linear_fc2.bias")},
                },
            },
        }

        def merger_map(prefix: str, stacked: bool) -> dict:
            tmpl = (lambda s: prefix + "{layer}." + s) if stacked else (lambda s: prefix + s)
            return {
                "norm": {"w": HFKey(tmpl("norm.weight")), "b": HFKey(tmpl("norm.bias"))},
                "fc1": {"w": HFKey(tmpl("linear_fc1.weight"), "linear"),
                        "b": HFKey(tmpl("linear_fc1.bias"))},
                "fc2": {"w": HFKey(tmpl("linear_fc2.weight"), "linear"),
                        "b": HFKey(tmpl("linear_fc2.bias"))},
            }

        proj = {
            "merger": merger_map("merger.", stacked=False),
            "deepstack_mergers": merger_map("deepstack_merger_list.", stacked=True),
        }
        is_leaf = lambda x: isinstance(x, HFKey)
        return {
            "vision": jax.tree.map(vis_prefix, vis, is_leaf=is_leaf),
            "projector": jax.tree.map(vis_prefix, proj, is_leaf=is_leaf),
            "language": jax.tree.map(lang_prefix, self.language.hf_key_map(), is_leaf=is_leaf),
        }


# ---------------------------------------------------------------------------
# host-side preprocessing (collator/tokenize-fn helpers; numpy only)
# ---------------------------------------------------------------------------
def smart_resize(height: int, width: int, factor: int = 32,
                 min_pixels: int = 65536, max_pixels: int = 16777216):
    """HF qwen-vl smart_resize: round to `factor` multiples while keeping the
    pixel count within [min_pixels, max_pixels] (qwen3_vl_tokenize_fn.py:48)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image: np.ndarray, patch_size: int = 16, merge_size: int = 2,
                     temporal_patch_size: int = 2, min_pixels: int = 65536,
                     max_pixels: int = 16777216):
    """(H, W, 3) uint8 -> (patches (P, C*tps*ps*ps) fp32, grid_thw (3,)).

    Matches the HF Qwen2VLImageProcessor patch layout: token order is
    (t, h_block, w_block, h_intra, w_intra) — merge-block major — and the
    feature axis is (channel, temporal, ph, pw). Resize is bilinear (HF uses
    bicubic; training-equivalent).
    """
    from ..datasets.vlm import _resize

    h, w = image.shape[:2]
    h_bar, w_bar = smart_resize(h, w, patch_size * merge_size, min_pixels, max_pixels)
    img = _resize(image, w_bar, h_bar)  # (h_bar, w_bar, 3) fp32
    img = (img / 255.0 - CLIP_MEAN) / CLIP_STD
    img = img.transpose(2, 0, 1)  # (C, H, W)
    # single image -> repeat to temporal_patch_size frames (HF behavior)
    img = np.tile(img[None], (temporal_patch_size, 1, 1, 1))  # (tps, C, H, W)
    grid_t = 1
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    c = img.shape[1]
    patches = img.reshape(
        grid_t, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = patches.reshape(grid_t * grid_h * grid_w,
                              c * temporal_patch_size * patch_size * patch_size)
    return patches.astype(np.float32), np.asarray([grid_t, grid_h, grid_w], np.int64)


def vision_geometry(grid_thw_list, num_grid_per_side: int, merge_size: int = 2,
                    total_patches: Optional[int] = None):
    """Host precompute of the per-patch geometry the jitted ViT consumes:
    bilinear pos-embed (indices, weights), 2D rotary (row, col), and per-frame
    segment ids. Mirrors HF fast_pos_embed_interpolate + rot_pos_emb including
    their merge-block output permutation."""
    idx_list, w_list, rot_list, seg_list = [], [], [], []
    seg = 1
    for (t, gh, gw) in [tuple(int(v) for v in g) for g in grid_thw_list]:
        m = merge_size
        # --- bilinear interpolation of the (side x side) pos-embed table ---
        h_idxs = np.linspace(0, num_grid_per_side - 1, gh, dtype=np.float32)
        w_idxs = np.linspace(0, num_grid_per_side - 1, gw, dtype=np.float32)
        h_floor = h_idxs.astype(np.int64)
        w_floor = w_idxs.astype(np.int64)
        h_ceil = np.minimum(h_floor + 1, num_grid_per_side - 1)
        w_ceil = np.minimum(w_floor + 1, num_grid_per_side - 1)
        dh, dw = h_idxs - h_floor, w_idxs - w_floor
        dh_g, dw_g = np.meshgrid(dh, dw, indexing="ij")
        hf_g, wf_g = np.meshgrid(h_floor, w_floor, indexing="ij")
        hc_g, wc_g = np.meshgrid(h_ceil, w_ceil, indexing="ij")
        w11 = dh_g * dw_g
        w10 = dh_g - w11
        w01 = dw_g - w11
        w00 = 1 - dh_g - w01
        idx4 = np.stack([
            hf_g * num_grid_per_side + wf_g,
            hf_g * num_grid_per_side + wc_g,
            hc_g * num_grid_per_side + wf_g,
            hc_g * num_grid_per_side + wc_g,
        ]).reshape(4, -1)
        wt4 = np.stack([w00, w01, w10, w11]).reshape(4, -1)
        # permute row-major (h, w) -> merge-block order
        perm = (np.arange(gh * gw).reshape(gh // m, m, gw // m, m)
                .transpose(0, 2, 1, 3).reshape(-1))
        idx4 = idx4[:, perm].T  # (gh*gw, 4)
        wt4 = wt4[:, perm].T
        idx_list.append(np.tile(idx4, (t, 1)))
        w_list.append(np.tile(wt4, (t, 1)))
        # --- 2D rotary positions, merge-block order (rot_pos_emb) ---
        br = np.arange(gh // m)[:, None, None, None]
        bc = np.arange(gw // m)[None, :, None, None]
        ir = np.arange(m)[None, None, :, None]
        ic = np.arange(m)[None, None, None, :]
        rows = np.broadcast_to(br * m + ir, (gh // m, gw // m, m, m)).reshape(-1)
        cols = np.broadcast_to(bc * m + ic, (gh // m, gw // m, m, m)).reshape(-1)
        rot = np.stack([rows, cols], axis=-1)  # (gh*gw, 2)
        rot_list.append(np.tile(rot, (t, 1)))
        # --- per-frame attention segments (HF cu_seqlens per t) ---
        seg_list.append(np.repeat(np.arange(seg, seg + t), gh * gw))
        seg += t

    idx = np.concatenate(idx_list).astype(np.int32) if idx_list else np.zeros((0, 4), np.int32)
    wts = np.concatenate(w_list).astype(np.float32) if w_list else np.zeros((0, 4), np.float32)
    rot = np.concatenate(rot_list).astype(np.int32) if rot_list else np.zeros((0, 2), np.int32)
    segs = np.concatenate(seg_list).astype(np.int32) if seg_list else np.zeros((0,), np.int32)
    if total_patches is not None:
        p = idx.shape[0]
        if p > total_patches:
            raise ValueError(f"batch has {p} vision patches > max_patches={total_patches}")
        pad = total_patches - p
        idx = np.pad(idx, ((0, pad), (0, 0)))
        wts = np.pad(wts, ((0, pad), (0, 0)))
        rot = np.pad(rot, ((0, pad), (0, 0)))
        segs = np.pad(segs, (0, pad))  # pad patches get segment 0 (masked out)
    return {
        "vision_pos_interp_idx": idx,
        "vision_pos_interp_w": wts,
        "vision_rot_pos": rot,
        "vision_segment_ids": segs,
    }


def qwen3vl_config_from_hf(hf_cfg) -> "Qwen3VLConfig":
    """Build from a transformers Qwen3VLConfig / Qwen3VLMoeConfig (AutoConfig
    sniffing analog of reference get_model_config_from_hf)."""
    from ..module.attention import MHAConfig
    from ..module.rope import RopeScalingConfig

    v, t = hf_cfg.vision_config, hf_cfg.text_config
    vision = Qwen3VLVisionConfig(
        depth=v.depth, hidden_size=v.hidden_size, num_attention_heads=v.num_heads,
        intermediate_size=v.intermediate_size, hidden_act=v.hidden_act,
        patch_size=v.patch_size, spatial_merge_size=v.spatial_merge_size,
        temporal_patch_size=v.temporal_patch_size,
        num_position_embeddings=v.num_position_embeddings,
        deepstack_visual_indexes=list(v.deepstack_visual_indexes),
        in_channels=getattr(v, "in_channels", 3),
    )
    rs = getattr(t, "rope_scaling", None) or {}
    scaling = RopeScalingConfig(rope_type="qwen3_vl",
                                mrope_section=list(rs.get("mrope_section", [24, 20, 20])))
    head_dim = getattr(t, "head_dim", None) or t.hidden_size // t.num_attention_heads
    eos = t.eos_token_id if getattr(t, "eos_token_id", None) is not None else 151645
    if isinstance(eos, (list, tuple)):
        eos = eos[0]
    attn = MHAConfig(num_attention_heads=t.num_attention_heads,
                     num_key_value_heads=t.num_key_value_heads,
                     head_dim=head_dim, qk_norm=True)
    common = dict(
        vocab_size=t.vocab_size, max_position_embeddings=t.max_position_embeddings,
        eos_token_id=eos, num_hidden_layers=t.num_hidden_layers,
        hidden_size=t.hidden_size, intermediate_size=t.intermediate_size,
        rms_norm_eps=t.rms_norm_eps, hidden_act=getattr(t, "hidden_act", "silu"),
        rope_theta=getattr(t, "rope_theta", 5000000.0), rope_scaling_cfg=scaling,
        tie_word_embeddings=getattr(t, "tie_word_embeddings", False),
        attention=attn,
    )
    if t.model_type == "qwen3_vl_moe_text":
        from ..module.router import GreedyRouterConfig
        from .moe import Qwen3MoEConfig

        text: Any = Qwen3MoEConfig(
            moe_intermediate_size=t.moe_intermediate_size,
            n_routed_experts=t.num_experts,
            num_experts_per_tok=t.num_experts_per_tok,
            balancing_loss_coef=0.001,
            router=GreedyRouterConfig(scoring_func="softmax", norm_topk_prob=True),
            hf_expert_format="fused_3d",
            **common,
        )
    else:
        from .dense import DenseConfig

        text = DenseConfig(**common)
    return Qwen3VLConfig(
        vision_cfg=vision, text_cfg=text,
        image_token_id=getattr(hf_cfg, "image_token_id", 151655),
        video_token_id=getattr(hf_cfg, "video_token_id", 151656),
        vision_start_token_id=getattr(hf_cfg, "vision_start_token_id", 151652),
        vision_end_token_id=getattr(hf_cfg, "vision_end_token_id", 151653),
    )


# ---------------------------------------------------------------------------
# presets (reference qwen3_vl_config.py:120-173)
# ---------------------------------------------------------------------------
def _qwen3vl_text_dense(hidden: int, inter: int, layers: int, heads: int,
                        kv_heads: int, tie: bool):
    from ..module.attention import MHAConfig
    from ..module.rope import RopeScalingConfig
    from .dense import DenseConfig

    return DenseConfig(
        vocab_size=151936, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, max_position_embeddings=262144,
        rope_theta=5000000.0,
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl",
                                           mrope_section=[24, 20, 20]),
        attention=MHAConfig(num_attention_heads=heads, num_key_value_heads=kv_heads,
                            head_dim=128, qk_norm=True),
        tie_word_embeddings=tie, eos_token_id=151645,
    )


class Qwen3VLDense4BConfig(Qwen3VLConfig):
    """Qwen3-VL-4B (reference Qwen3VLDense4BConfig)."""

    vision_cfg: Qwen3VLVisionConfig = Qwen3VLVisionConfig(
        depth=24, hidden_size=1024, intermediate_size=4096,
        deepstack_visual_indexes=[5, 11, 17])
    text_cfg: Any = _qwen3vl_text_dense(2560, 9728, 36, 32, 8, tie=True)


class Qwen3VLDense8BConfig(Qwen3VLConfig):
    """Qwen3-VL-8B (reference Qwen3VLDense8BConfig)."""

    vision_cfg: Qwen3VLVisionConfig = Qwen3VLVisionConfig()
    text_cfg: Any = _qwen3vl_text_dense(4096, 12288, 36, 32, 8, tie=False)


def _qwen3vl_text_moe_30b():
    from ..module.rope import RopeScalingConfig
    from .moe import qwen3_moe_30b_a3

    return qwen3_moe_30b_a3().model_copy(update=dict(
        max_position_embeddings=262144, rope_theta=5000000.0,
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl",
                                           mrope_section=[24, 20, 20]),
    ))


class Qwen3VLMoE30BA3Config(Qwen3VLConfig):
    """Qwen3-VL-MoE-30B-A3 (reference Qwen3VLMoE30BA3Config)."""

    vision_cfg: Qwen3VLVisionConfig = Qwen3VLVisionConfig()
    text_cfg: Any = None

    def model_post_init(self, _ctx):
        if self.text_cfg is None:
            object.__setattr__(self, "text_cfg", _qwen3vl_text_moe_30b())


class Qwen35VLMoE35BA3Config(Qwen3VLConfig):
    """Qwen3.5-VL-35B-A3B (reference compose/qwen3_5/qwen3_5_config.py
    Qwen3_5_VLMoE35BA3Config): the Qwen3VL vision tower (deepstack disabled
    by default in 3.5) over the hybrid GatedDeltaNet/full-attention MoE text
    model. New vision token ids (248053-248057)."""

    vision_cfg: Qwen3VLVisionConfig = Qwen3VLVisionConfig(
        deepstack_visual_indexes=[])
    text_cfg: Any = None
    image_token_id: int = 248056
    video_token_id: int = 248057
    vision_start_token_id: int = 248053
    vision_end_token_id: int = 248054

    def model_post_init(self, _ctx):
        if self.text_cfg is None:
            from .hybrid import qwen3_5_moe_35b_a3b

            object.__setattr__(self, "text_cfg", qwen3_5_moe_35b_a3b())
