"""Activation functions (reference: xtuner/v1/ops/act_fn.py registry)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACT2FN = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


def get_act_fn(name: str):
    if name not in _ACT2FN:
        raise KeyError(f"Unknown activation {name!r}; known: {sorted(_ACT2FN)}")
    return _ACT2FN[name]


def swiglu(gate, up, act: str = "silu"):
    return get_act_fn(act)(gate) * up


def swiglu_clipped(gate, up, alpha: float = 1.702, limit: float = 7.0):
    """GPT-OSS clipped swiglu variant (reference gpt_oss experts)."""
    gate = jnp.clip(gate, max=limit)
    up = jnp.clip(up, min=-limit, max=limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return (up + 1) * glu
