"""TensorBoard scalar writer (reference: xtuner/v1/_writer/tb_writer.py).
Uses torch's SummaryWriter if tensorboard is importable; otherwise no-ops."""

from __future__ import annotations

from pathlib import Path
from typing import Any


class TensorboardWriter:
    def __init__(self, log_dir: str | Path):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=str(log_dir))
        except Exception:  # tensorboard not installed
            self._writer = None

    def add_scalars(self, scalars: dict[str, Any], step: int) -> None:
        if self._writer is None:
            return
        for k, v in scalars.items():
            try:
                self._writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
