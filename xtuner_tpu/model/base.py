"""Base model config + outputs.

Reference: xtuner/v1/model/base.py (XTunerBaseModelConfig :132, TransformerConfig
:197, ModelOutputs :402, BaseModel :541). The TPU rebuild keeps the pydantic
config surface but the model itself is a *pure-function pair*:
``param_specs()`` (declarative parameters with logical shardings) and
``forward(params, seq_ctx, ...)``. Everything FSDP-specific in the reference
(fully_shard, LoadSpec DTensor scatter, meta-device init, compile controls)
is replaced by ParamSpec + GSPMD + jit.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel as PydanticBaseModel, ConfigDict

from ..loss.ce_loss import CELossConfig
from ..module.attention import MHAConfig
from ..module.lora import LoraConfig
from ..module.mla import MLAConfig
from ..module.rope import RopeScalingConfig
from ..ops.float8 import Float8Config


@jax.tree_util.register_dataclass
@dataclass
class ModelOutputs:
    """Pytree output (the reference registers its pydantic ModelOutputs as a
    pytree for compile/AC traversal, base.py:402-513 — a dataclass pytree is
    the JAX-native equivalent). The engine sums every ``*loss*`` field."""

    loss: Optional[jax.Array] = None
    sum_ce: Optional[jax.Array] = None
    num_tokens: Optional[jax.Array] = None
    balancing_loss: Optional[jax.Array] = None
    z_loss: Optional[jax.Array] = None
    mtp_loss: Optional[jax.Array] = None
    # DSA lightning-indexer distillation (reference ops/sparse_mla; the
    # indexer's only gradient path) — summed into total_loss by name
    dsa_index_loss: Optional[jax.Array] = None
    hidden_states: Optional[jax.Array] = None
    # per-layer expert token counts (L_moe, E) — consumed by the engine's
    # post-step noaux bias update (reference moe.py:296-361); NOT a loss field
    expert_load: Optional[jax.Array] = None
    # MTP layers' expert token counts (mtp_depths, E): the reference's
    # update_bias consumes main-MoE rows AND MTP rows (moe.py:326-349); kept
    # separate so the engine can address the mtp_layers router stack (and
    # aggregate depths when MTP weights are shared, glm52.py:292)
    mtp_expert_load: Optional[jax.Array] = None

    def total_loss(self):
        total = 0.0
        for f in dataclasses.fields(self):
            if "loss" in f.name:
                v = getattr(self, f.name)
                if v is not None:
                    total = total + v
        return total


class TransformerConfig(PydanticBaseModel):
    """Architecture config; field names mirror the reference TransformerConfig
    (model/base.py:197-260) so configs translate one-to-one."""

    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    vocab_size: int
    max_position_embeddings: int = 32768
    eos_token_id: int = 0
    pad_token_id: Optional[int] = None
    num_hidden_layers: int
    hidden_size: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rms_norm_type: str = "default"  # default | zero_centered
    hidden_act: str = "silu"
    attention: MHAConfig | MLAConfig
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    model_type: Optional[str] = None
    use_sliding_window: bool = False
    sliding_window: Optional[int] = None
    max_window_layers: Optional[int] = None
    rope_theta: float = 10000.0
    rope_scaling_cfg: Optional[RopeScalingConfig] = None
    lm_loss_cfg: CELossConfig = CELossConfig()
    # hf interop
    hf_config_overrides: dict[str, Any] = {}

    # DSA lightning-indexer distillation weight (only read when attention is
    # a DSAConfig; reference dsa_mla indexer loss)
    dsa_index_loss_coef: float = 1.0

    # ---- knobs the engine reads ----
    init_scale: float = 0.02
    attn_impl: Optional[str] = None  # None = device default
    lora_cfg: Optional[LoraConfig] = None  # v0 peft-LoRA capability
    float8_cfg: Optional["Float8Config"] = None  # fp8 matmul path (reference float8/)

    def build(self):
        raise NotImplementedError

    @property
    def head_dim(self) -> int:
        return self.attention.head_dim
