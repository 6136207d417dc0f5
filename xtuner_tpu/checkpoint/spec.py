"""HF checkpoint key specs.

Reference: the LoadSpec system (xtuner/v1/model/base.py:1030-1171,
utils/load_spec.py) maps every parameter to HF safetensor keys with a
placement enum (same/fused/sharded). Here each ParamSpec leaf gets an `HFKey`
declaring the HF key template and the layout transform; layer-stacked params
use "{layer}" in the template and are loaded/saved slice-by-slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class HFKey:
    template: str  # e.g. "model.layers.{layer}.self_attn.q_proj.weight"
    # transform from HF tensor -> our layout:
    #   "linear":   torch nn.Linear weight (out, in) -> ours (in, out): transpose
    #   "none":     identical layout (norms, biases, embeddings)
    #   "experts":  per-expert HF keys stacked on dim 0; template has {expert}
    transform: str = "none"
    # stacked-layer params: our stack index i maps to HF layer
    # i * layer_stride + layer_offset (MoE stacks start after
    # first_k_dense_replace; hybrid pattern stacks interleave with a stride)
    layer_offset: int = 0
    layer_stride: int = 1
    # if several of our params map to ONE fused HF tensor (or vice versa),
    # `fuse_dim` + `fuse_slice` describe the slice of the HF tensor we own.
    fuse_dim: Optional[int] = None
    fuse_start: Optional[int] = None
    fuse_size: Optional[int] = None


def is_hf_key(x) -> bool:
    return isinstance(x, HFKey)
