"""Gated MLP (SwiGLU) module — reference: the MLP inside
xtuner/v1/module/decoder_layer/dense_decoder_layer.py."""

from __future__ import annotations

from ..ops.act_fn import get_act_fn
from .params import ParamSpec


def mlp_param_specs(hidden_size: int, intermediate_size: int, init_scale: float = 0.02,
                    bias: bool = False) -> dict:
    specs = {
        "gate_proj": {"w": ParamSpec((hidden_size, intermediate_size), ("embed_shard", "mlp"), scale=init_scale)},
        "up_proj": {"w": ParamSpec((hidden_size, intermediate_size), ("embed_shard", "mlp"), scale=init_scale)},
        "down_proj": {"w": ParamSpec((intermediate_size, hidden_size), ("mlp", "embed_shard"), scale=init_scale)},
    }
    if bias:
        specs["gate_proj"]["b"] = ParamSpec((intermediate_size,), ("mlp",), init="zeros")
        specs["up_proj"]["b"] = ParamSpec((intermediate_size,), ("mlp",), init="zeros")
        specs["down_proj"]["b"] = ParamSpec((hidden_size,), (None,), init="zeros")
    return specs


def _linear(x, p):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_forward(p: dict, x, act: str = "silu"):
    gate = _linear(x, p["gate_proj"])
    up = _linear(x, p["up_proj"])
    return _linear(get_act_fn(act)(gate) * up, p["down_proj"])
