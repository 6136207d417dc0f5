"""Model registry: name -> config factory.

Reference: model_mapping + get_model_config_from_hf (xtuner/v1/model/__init__.py:31-80).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

from . import qwen

def _moe_presets():
    from . import deepseek, glm, gpt_oss, moe

    return {
        "qwen3-moe-30b-a3": moe.qwen3_moe_30b_a3,
        "qwen3-moe-235b-a22": moe.qwen3_moe_235b_a22,
        "deepseek-v3": deepseek.deepseek_v3,
        "gpt-oss-20b": gpt_oss.gpt_oss_20b,
        "gpt-oss-120b": gpt_oss.gpt_oss_120b,
        "glm-4.5-air": glm.glm_45_air,
        "glm-5.2": glm.glm_52,
    }


def _hybrid_presets():
    from . import hybrid

    return {
        "qwen3.5-moe-35b-a3b": hybrid.qwen3_5_moe_35b_a3b,
    }


def _vlm_presets():
    from . import qwen3_vl

    return {
        "qwen3-vl-4b": qwen3_vl.Qwen3VLDense4BConfig,
        "qwen3-vl-8b": qwen3_vl.Qwen3VLDense8BConfig,
        "qwen3-vl-moe-30b-a3": qwen3_vl.Qwen3VLMoE30BA3Config,
        "qwen3.5-vl-35b-a3b": qwen3_vl.Qwen35VLMoE35BA3Config,
    }


model_mapping: dict[str, Callable] = {
    "qwen2-5-0.5b": qwen.qwen2_5_0_5b,
    "qwen2-7b": qwen.qwen2_7b,
    "qwen3-0-6b": qwen.qwen3_0_6b,
    "qwen3-4b": qwen.qwen3_4b,
    "qwen3-8b": qwen.qwen3_8b,
    **_moe_presets(),
    **_vlm_presets(),
    **_hybrid_presets(),
}


def register_model(name: str, factory: Callable) -> None:
    model_mapping[name] = factory


def get_model_config(name_or_path: str):
    """Resolve a registry name or an HF checkpoint directory to a model config."""
    if name_or_path in model_mapping:
        return model_mapping[name_or_path]()
    path = Path(name_or_path)
    if path.exists() and (path / "config.json").exists():
        from transformers import AutoConfig

        hf_cfg = AutoConfig.from_pretrained(path, trust_remote_code=True)
        model_type = getattr(hf_cfg, "model_type", "")
        if model_type in ("qwen3_moe",):
            from .moe import moe_config_from_hf

            return moe_config_from_hf(hf_cfg)
        if model_type in ("deepseek_v3", "deepseek_v2"):
            from .deepseek import deepseek_config_from_hf

            return deepseek_config_from_hf(hf_cfg)
        if model_type in ("qwen3_vl", "qwen3_vl_moe"):
            from .qwen3_vl import qwen3vl_config_from_hf

            return qwen3vl_config_from_hf(hf_cfg)
        return qwen.dense_config_from_hf(hf_cfg)
    raise KeyError(
        f"Unknown model {name_or_path!r}; known: {sorted(model_mapping)} or an HF checkpoint dir"
    )
