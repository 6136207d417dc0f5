"""One-call factories over the typed config surface."""

from __future__ import annotations

from typing import Any, Optional

from ..config.optim import AdamWConfig, LRConfig
from ..datasets.config import DataloaderConfig, DatasetConfig
from ..model.registry import get_model_config
from ..parallel.mesh import MeshConfig
from ..train.trainer import Trainer, TrainerConfig


def build_model(name_or_path: str, **overrides):
    """-> (model, config). Registry name or HF checkpoint dir."""
    cfg = get_model_config(name_or_path)
    if overrides:
        cfg = cfg.model_copy(update=overrides)
    return cfg.build(), cfg


def build_dataloader(data_path: str, tokenizer, *, pack_max_length: int = 16384,
                     global_batch_rows: int = 8, micro_batch_rows: int = 1,
                     dataset_type: str = "openai_sft", chat_template: str = "qwen",
                     **kw) -> Any:
    cfg = DataloaderConfig(
        datasets=[DatasetConfig(anno_path=data_path, class_name=dataset_type,
                                chat_template=chat_template)],
        pack_max_length=pack_max_length, **kw)
    return cfg.build(tokenizer, global_batch_rows, micro_batch_rows)


def build_trainer(model: str, dataset: str, *, lr: float = 1e-5,
                  pack_max_length: int = 16384, global_batch_rows: int = 8,
                  micro_batch_rows: int = 1, total_steps: Optional[int] = None,
                  load_from: Optional[str] = None, tokenizer_path: Optional[str] = None,
                  mesh: Optional[MeshConfig] = None, work_dir: str = "work_dirs",
                  exp_name: str = "api", **trainer_kw) -> Trainer:
    cfg = TrainerConfig(
        model_cfg=get_model_config(model),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path=dataset)],
            pack_max_length=pack_max_length),
        optim_cfg=AdamWConfig(lr=lr),
        lr_cfg=LRConfig(),
        mesh_cfg=mesh or MeshConfig(),
        global_batch_rows=global_batch_rows,
        micro_batch_rows=micro_batch_rows,
        total_steps=total_steps,
        load_from=load_from,
        tokenizer_path=tokenizer_path or load_from,
        work_dir=work_dir,
        exp_name=exp_name,
        **trainer_kw,
    )
    return Trainer(cfg)


def quick_sft(model: str, dataset: str, **kw) -> Trainer:
    """Build and fit in one call; returns the trainer after training."""
    trainer = build_trainer(model, dataset, **kw)
    trainer.fit()
    return trainer
