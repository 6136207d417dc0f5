"""Multi-token prediction (MTP).

Reference: xtuner/v1/module/mtp/ (mtp_block.py/mtp_layer.py — extra decoder
layer(s) whose input fuses the trunk hidden state with the embedding of the
next token; predicts token t+1+depth with a shared LM head) + loss/mtp_loss.py.
DeepSeek V3 / GLM-5 structure: x_k = Layer(W_proj [RMSNorm(h); RMSNorm(E(t+k))]).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.rms_norm import rms_norm
from .params import ParamSpec


def mtp_extra_param_specs(hidden_size: int, init_scale: float = 0.02) -> dict:
    """Per-depth extras beside the decoder-layer params."""
    return {
        "proj": {"w": ParamSpec((2 * hidden_size, hidden_size), (None, "embed_shard"),
                                scale=init_scale)},
        "hidden_norm": ParamSpec((hidden_size,), (None,), init="ones"),
        "embed_norm": ParamSpec((hidden_size,), (None,), init="ones"),
    }


def mtp_fuse(extra: dict, h, next_embed, eps: float = 1e-6):
    """h, next_embed: (B, L, H) -> fused (B, L, H) input for the MTP layer."""
    fused = jnp.concatenate([
        rms_norm(h, extra["hidden_norm"], eps),
        rms_norm(next_embed, extra["embed_norm"], eps),
    ], axis=-1)
    return fused @ extra["proj"]["w"]


def shift_for_mtp(ids_or_labels, segment_ids, fill):
    """Shift left by one position WITHIN documents: out[t] = x[t+1] if
    segment[t+1] == segment[t] != 0 else fill."""
    x = ids_or_labels
    shifted = jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)
    seg_next = jnp.concatenate([segment_ids[:, 1:], jnp.zeros_like(segment_ids[:, :1])], axis=1)
    same_doc = (seg_next == segment_ids) & (segment_ids != 0)
    return jnp.where(same_doc, shifted, fill)
