"""LoRA adapters.

Reference capability: legacy v0's peft LoRA/QLoRA wrapping
(xtuner/model/sft.py:161-171). TPU-native design: no module wrapping — LoRA
is two extra ParamSpec leaves (`lora_a`, `lora_b`) beside each targeted
weight; `lora_linear` applies y = x W + (alpha/r) (x A) B, the base weight is
frozen by the optimizer label mask + stop_gradient (XLA then dead-code-
eliminates the frozen grads), and `merge_lora` folds adapters into the base
weights for standard HF export.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from .params import ParamSpec

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


class LoraConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    r: int = 16
    alpha: float = 32.0
    target_modules: tuple[str, ...] = DEFAULT_TARGETS
    train_norms: bool = False  # also train RMSNorm scales
    train_embed: bool = False
    # QLoRA: store the frozen base weights of targeted modules as NF4 codes
    qlora: bool = False
    q_block: int = 64

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def add_lora_specs(proj_specs: dict, name: str, spec_w: ParamSpec,
                   lora: Optional[LoraConfig]) -> None:
    """Mutates a {'w': spec, ...} projection dict to add adapter specs (and
    under QLoRA, replace the dense base weight with NF4 code + scale specs)."""
    import math

    if lora is None or name not in lora.target_modules:
        return
    d_in, d_out = spec_w.shape[-2], spec_w.shape[-1]
    lead = spec_w.shape[:-2]
    lead_axes = spec_w.axes[:-2]
    proj_specs["lora_a"] = ParamSpec((*lead, d_in, lora.r), (*lead_axes, spec_w.axes[-2], None),
                                     init="normal", scale=1.0 / lora.r)
    proj_specs["lora_b"] = ParamSpec((*lead, lora.r, d_out), (*lead_axes, None, spec_w.axes[-1]),
                                     init="zeros")
    if lora.qlora:
        import jax.numpy as jnp

        n = d_in * d_out
        del proj_specs["w"]
        proj_specs["w_q4"] = ParamSpec((*lead, n // 2), (*lead_axes, None),
                                       init="zeros", dtype=jnp.uint8)
        proj_specs["w_absmax"] = ParamSpec((*lead, n // lora.q_block), (*lead_axes, None),
                                           init="ones")


def lora_linear(x, p: dict, scaling: float, fp8_cfg=None):
    if "w_q4" in p:  # QLoRA: dequantize the frozen NF4 base at use
        from .quant import dequantize_nf4

        d_in = p["lora_a"].shape[-2]
        d_out = p["lora_b"].shape[-1]
        w = dequantize_nf4(p["w_q4"], p["w_absmax"], (d_in, d_out), dtype=x.dtype)
        y = x @ w
    elif fp8_cfg is not None and getattr(fp8_cfg, "enabled", False):
        from ..ops.float8 import fp8_matmul

        y = fp8_matmul(x, p["w"], fp8_cfg.scaling_granularity, fp8_cfg.tile,
                       getattr(fp8_cfg, "e5m2_grads", False))
    else:
        y = x @ p["w"]
    if "lora_a" in p:
        y = y + ((x @ p["lora_a"]) @ p["lora_b"]) * scaling
    if "b" in p:
        y = y + p["b"]
    return y


def is_lora_path(path) -> bool:
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    return any(k in ("lora_a", "lora_b") for k in keys)


def lora_param_labels(params, lora: LoraConfig):
    """'train' for adapter params (and optionally norms/embed), 'freeze' else."""

    def label(path, p):
        if is_lora_path(path):
            return "train"
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if lora.train_norms and any("norm" in str(k) for k in keys):
            return "train"
        if lora.train_embed and "embed" in keys:
            return "train"
        return "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_stop_gradient(params, labels):
    """stop_gradient on frozen leaves so XLA eliminates their grad compute."""
    return jax.tree.map(
        lambda p, lab: jax.lax.stop_gradient(p) if lab == "freeze" else p, params, labels
    )


def merge_lora(params, scaling: float):
    """Fold every (lora_a, lora_b) pair into its base weight (dequantizing
    NF4 bases first); returns a tree WITHOUT adapter leaves."""

    def merge(node):
        if isinstance(node, dict) and "lora_a" in node:
            node = dict(node)
            a, b = node.pop("lora_a"), node.pop("lora_b")
            delta = jnp.einsum("...ir,...ro->...io", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scaling
            if "w_q4" in node:
                from .quant import dequantize_nf4

                codes, absmax = node.pop("w_q4"), node.pop("w_absmax")
                d_in, d_out = a.shape[-2], b.shape[-1]
                if codes.ndim == 2:  # layer-stacked
                    w = jnp.stack([
                        dequantize_nf4(codes[i], absmax[i], (d_in, d_out), dtype=jnp.float32)
                        for i in range(codes.shape[0])
                    ])
                else:
                    w = dequantize_nf4(codes, absmax, (d_in, d_out), dtype=jnp.float32)
                node["w"] = (w + delta).astype(jnp.float32)
                return node
            node["w"] = (node["w"].astype(jnp.float32) + delta).astype(node["w"].dtype)
            return node
        if isinstance(node, dict):
            return {k: merge(v) for k, v in node.items()}
        return node

    return merge(params)
