"""Qwen dense presets.

Reference: xtuner/v1/model/dense/qwen2.py, qwen3.py (config subclasses with
to_hf_key_list converters). Sizes per the public HF configs.
"""

from __future__ import annotations

from typing import Any

from ..module.attention import MHAConfig
from .dense import DenseConfig


class Qwen2DenseConfig(DenseConfig):
    model_type: str | None = "qwen2"


class Qwen3DenseConfig(DenseConfig):
    model_type: str | None = "qwen3"


def _qwen3_dense(hidden: int, inter: int, layers: int, heads: int, kv_heads: int,
                 head_dim: int = 128, vocab: int = 151936, tie: bool = False) -> Qwen3DenseConfig:
    return Qwen3DenseConfig(
        vocab_size=vocab,
        max_position_embeddings=40960,
        eos_token_id=151645,
        pad_token_id=151643,
        num_hidden_layers=layers,
        hidden_size=hidden,
        intermediate_size=inter,
        rms_norm_eps=1e-6,
        hidden_act="silu",
        rope_theta=1000000.0,
        tie_word_embeddings=tie,
        attention=MHAConfig(
            num_attention_heads=heads,
            num_key_value_heads=kv_heads,
            head_dim=head_dim,
            qk_norm=True,
        ),
    )


def qwen3_0_6b() -> Qwen3DenseConfig:
    return _qwen3_dense(1024, 3072, 28, 16, 8, tie=True)


def qwen3_4b() -> Qwen3DenseConfig:
    return _qwen3_dense(2560, 9728, 36, 32, 8, tie=True)


def qwen3_8b() -> Qwen3DenseConfig:
    return _qwen3_dense(4096, 12288, 36, 32, 8)


def qwen2_5_0_5b() -> Qwen2DenseConfig:
    return Qwen2DenseConfig(
        vocab_size=151936,
        max_position_embeddings=32768,
        eos_token_id=151645,
        pad_token_id=151643,
        num_hidden_layers=24,
        hidden_size=896,
        intermediate_size=4864,
        rms_norm_eps=1e-6,
        hidden_act="silu",
        rope_theta=1000000.0,
        tie_word_embeddings=True,
        attention=MHAConfig(
            num_attention_heads=14,
            num_key_value_heads=2,
            head_dim=64,
            qkv_bias=True,
        ),
    )


def qwen2_7b() -> Qwen2DenseConfig:
    return Qwen2DenseConfig(
        vocab_size=152064,
        max_position_embeddings=32768,
        eos_token_id=151645,
        pad_token_id=151643,
        num_hidden_layers=28,
        hidden_size=3584,
        intermediate_size=18944,
        rms_norm_eps=1e-6,
        hidden_act="silu",
        rope_theta=1000000.0,
        attention=MHAConfig(
            num_attention_heads=28,
            num_key_value_heads=4,
            head_dim=128,
            qkv_bias=True,
        ),
    )


def dense_config_from_hf(hf_cfg: Any) -> DenseConfig:
    """Build a DenseConfig from a transformers PretrainedConfig (the analog of
    get_model_config_from_hf AutoConfig sniffing, model/__init__.py:31-80)."""
    cls = Qwen3DenseConfig if getattr(hf_cfg, "model_type", "") == "qwen3" else Qwen2DenseConfig
    qk_norm = getattr(hf_cfg, "model_type", "") == "qwen3"
    head_dim = getattr(hf_cfg, "head_dim", None) or hf_cfg.hidden_size // hf_cfg.num_attention_heads
    return cls(
        vocab_size=hf_cfg.vocab_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        eos_token_id=hf_cfg.eos_token_id if hf_cfg.eos_token_id is not None else 0,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        hidden_act=getattr(hf_cfg, "hidden_act", "silu"),
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        tie_word_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        attention=MHAConfig(
            num_attention_heads=hf_cfg.num_attention_heads,
            num_key_value_heads=hf_cfg.num_key_value_heads,
            head_dim=head_dim,
            qk_norm=qk_norm,
            qkv_bias=getattr(hf_cfg, "attention_bias", cls is Qwen2DenseConfig),
        ),
    )
