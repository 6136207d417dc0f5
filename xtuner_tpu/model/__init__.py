from .base import ModelOutputs, TransformerConfig
from .dense import Dense, DenseConfig
from .registry import get_model_config, model_mapping

__all__ = [
    "ModelOutputs",
    "TransformerConfig",
    "Dense",
    "DenseConfig",
    "get_model_config",
    "model_mapping",
]
