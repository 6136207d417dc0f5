"""Gated MLP (SwiGLU) module — reference: the MLP inside
xtuner/v1/module/decoder_layer/dense_decoder_layer.py."""

from __future__ import annotations

from typing import Optional

from ..ops.act_fn import get_act_fn
from .lora import LoraConfig, add_lora_specs, lora_linear
from .params import ParamSpec


def mlp_param_specs(hidden_size: int, intermediate_size: int, init_scale: float = 0.02,
                    bias: bool = False, lora: Optional[LoraConfig] = None) -> dict:
    specs = {
        "gate_proj": {"w": ParamSpec((hidden_size, intermediate_size), ("embed_shard", "mlp"), scale=init_scale)},
        "up_proj": {"w": ParamSpec((hidden_size, intermediate_size), ("embed_shard", "mlp"), scale=init_scale)},
        "down_proj": {"w": ParamSpec((intermediate_size, hidden_size), ("mlp", "embed_shard"), scale=init_scale)},
    }
    if bias:
        specs["gate_proj"]["b"] = ParamSpec((intermediate_size,), ("mlp",), init="zeros")
        specs["up_proj"]["b"] = ParamSpec((intermediate_size,), ("mlp",), init="zeros")
        specs["down_proj"]["b"] = ParamSpec((hidden_size,), (None,), init="zeros")
    for name in ("gate_proj", "up_proj", "down_proj"):
        add_lora_specs(specs[name], name, specs[name]["w"], lora)
    return specs


def mlp_forward(p: dict, x, act: str = "silu", lora_scaling: float = 1.0, fp8_cfg=None):
    gate = lora_linear(x, p["gate_proj"], lora_scaling, fp8_cfg)
    up = lora_linear(x, p["up_proj"], lora_scaling, fp8_cfg)
    if act == "swiglu_clipped":  # GPT-OSS variant (shared/dense layers)
        from ..ops.act_fn import swiglu_clipped

        hidden = swiglu_clipped(gate, up).astype(x.dtype)
    else:
        hidden = get_act_fn(act)(gate) * up
    return lora_linear(hidden, p["down_proj"], lora_scaling, fp8_cfg)
