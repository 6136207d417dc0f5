"""Programmatic factory APIs (reference: legacy v0 xtuner/apis/, 850 LoC —
dataset/model/training factory fns for embedding xtuner in other code)."""

from .factory import build_dataloader, build_model, build_trainer, quick_sft

__all__ = ["build_model", "build_dataloader", "build_trainer", "quick_sft"]
