"""Vision transformer tower + projector (InternVL-style).

Reference: xtuner/v1/model/compose/intern_s1/modeling_vision.py (ViT, 436 LoC)
+ pixel-shuffle (modeling_intern_s1.py:38-48) + MLP projector. TPU design:
patchify is a reshape+matmul (identical to stride-P conv, but lowers straight
to the MXU), encoder blocks run under scan like the LM, attention is full
bidirectional within each tile (tiles ride the batch dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from ..module.params import ParamSpec, cast_tree, stack_specs
from ..ops.act_fn import get_act_fn


class ViTConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu"
    use_cls_token: bool = True
    downsample_ratio: float = 0.5  # pixel shuffle factor

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def tokens_per_tile(self) -> int:
        g = int(self.grid * self.downsample_ratio)
        return g * g


def layer_norm(x, w, b, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def vit_param_specs(cfg: ViTConfig, init_scale: float = 0.02) -> dict:
    h, f = cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    n_pos = cfg.num_patches + (1 if cfg.use_cls_token else 0)
    layer = {
        "norm1": {"w": ParamSpec((h,), (None,), init="ones"),
                  "b": ParamSpec((h,), (None,), init="zeros")},
        "attn": {
            "qkv": {"w": ParamSpec((h, 3 * h), ("embed_shard", "heads"), scale=init_scale),
                    "b": ParamSpec((3 * h,), (None,), init="zeros")},
            "proj": {"w": ParamSpec((h, h), ("heads", "embed_shard"), scale=init_scale),
                     "b": ParamSpec((h,), (None,), init="zeros")},
        },
        "norm2": {"w": ParamSpec((h,), (None,), init="ones"),
                  "b": ParamSpec((h,), (None,), init="zeros")},
        "mlp": {
            "fc1": {"w": ParamSpec((h, f), ("embed_shard", "mlp"), scale=init_scale),
                    "b": ParamSpec((f,), (None,), init="zeros")},
            "fc2": {"w": ParamSpec((f, h), ("mlp", "embed_shard"), scale=init_scale),
                    "b": ParamSpec((h,), (None,), init="zeros")},
        },
        # per-layer layer-scale (InternVL ls1/ls2)
        "ls1": ParamSpec((h,), (None,), init="ones"),
        "ls2": ParamSpec((h,), (None,), init="ones"),
    }
    specs: dict = {
        "patch_embed": {"w": ParamSpec((patch_dim, h), (None, "embed_shard"), scale=init_scale),
                        "b": ParamSpec((h,), (None,), init="zeros")},
        "pos_embed": ParamSpec((n_pos, h), (None, None), scale=init_scale),
        "blocks": stack_specs(layer, cfg.num_hidden_layers),
    }
    if cfg.use_cls_token:
        specs["cls_token"] = ParamSpec((1, h), (None, None), scale=init_scale)
    return specs


def _vit_attention(p, cfg: ViTConfig, x):
    b, n, h = x.shape
    nh = cfg.num_attention_heads
    d = h // nh
    qkv = (x @ p["qkv"]["w"] + p["qkv"]["b"]).reshape(b, n, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32))
    probs = jax.nn.softmax(logits * d**-0.5, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", probs, v.astype(jnp.float32)).astype(x.dtype)
    return o.reshape(b, n, h) @ p["proj"]["w"] + p["proj"]["b"]


def vit_forward(params, cfg: ViTConfig, pixel_values, compute_dtype=jnp.bfloat16):
    """pixel_values: (T, 3, H, W) tiles -> (T, tokens_per_tile, hidden)."""
    t = pixel_values.shape[0]
    g, ps = cfg.grid, cfg.patch_size
    x = pixel_values.astype(compute_dtype)
    # patchify: (T, 3, g, ps, g, ps) -> (T, g*g, 3*ps*ps)
    x = x.reshape(t, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5).reshape(t, g * g, 3 * ps * ps)
    x = x @ params["patch_embed"]["w"].astype(compute_dtype) + params["patch_embed"]["b"].astype(compute_dtype)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (t, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(compute_dtype)[None]

    def block(x, lp):
        lp = cast_tree(lp, compute_dtype)
        h1 = layer_norm(x, lp["norm1"]["w"], lp["norm1"]["b"], cfg.layer_norm_eps)
        x = x + _vit_attention(lp["attn"], cfg, h1) * lp["ls1"]
        h2 = layer_norm(x, lp["norm2"]["w"], lp["norm2"]["b"], cfg.layer_norm_eps)
        h2 = get_act_fn(cfg.hidden_act)(h2 @ lp["mlp"]["fc1"]["w"] + lp["mlp"]["fc1"]["b"])
        h2 = h2 @ lp["mlp"]["fc2"]["w"] + lp["mlp"]["fc2"]["b"]
        return x + h2 * lp["ls2"], None

    x, _ = jax.lax.scan(jax.checkpoint(block, prevent_cse=False), x, params["blocks"])
    if cfg.use_cls_token:
        x = x[:, 1:]
    # pixel shuffle downsample (modeling_intern_s1.py:38-48)
    ratio = cfg.downsample_ratio
    if ratio != 1.0:
        s = int(1 / ratio)
        h = cfg.hidden_size
        x = x.reshape(t, g, g, h)
        x = x.reshape(t, g, g // s, h * s)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(t, g // s, g // s, h * s * s)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(t, (g // s) * (g // s), h * s * s)
    return x


class ProjectorConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    in_dim: int  # vit hidden * (1/downsample)^2
    out_dim: int  # LLM hidden
    hidden_act: str = "gelu"


def projector_param_specs(cfg: ProjectorConfig, init_scale: float = 0.02) -> dict:
    return {
        "norm": {"w": ParamSpec((cfg.in_dim,), (None,), init="ones"),
                 "b": ParamSpec((cfg.in_dim,), (None,), init="zeros")},
        "fc1": {"w": ParamSpec((cfg.in_dim, cfg.out_dim), (None, "embed_shard"), scale=init_scale),
                "b": ParamSpec((cfg.out_dim,), (None,), init="zeros")},
        "fc2": {"w": ParamSpec((cfg.out_dim, cfg.out_dim), ("embed_shard", None), scale=init_scale),
                "b": ParamSpec((cfg.out_dim,), (None,), init="zeros")},
    }


def projector_forward(p, cfg: ProjectorConfig, x, compute_dtype=jnp.bfloat16):
    p = cast_tree(p, compute_dtype)
    x = layer_norm(x, p["norm"]["w"], p["norm"]["b"])
    x = get_act_fn(cfg.hidden_act)(x @ p["fc1"]["w"] + p["fc1"]["b"])
    return x @ p["fc2"]["w"] + p["fc2"]["b"]
