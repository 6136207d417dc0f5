"""Prober: named tensor-dump points for numeric debugging.

Reference: xtuner/v1/profiler/prober.py (1,180 LoC — static hook points
compiled into model code: before_layer/after_moe_gate/before_dispatch/...,
gated per step, dumping tensors). TPU design: probe points are
`jax.debug.callback` taps that fire only when a prober is activated — zero
cost when inactive (the tap is never traced in).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()

_ACTIVE: Optional["Prober"] = None
_LOCK = threading.Lock()


class Prober:
    """Collects named tensors from probe() call sites during traced steps.

    Usage:
        with Prober(out_dir, points=["after_moe_gate"]) as p:
            engine.train_step(...)   # must be a fresh trace (new step fn)
        p.summary()
    """

    def __init__(self, out_dir: str | Path, points: Optional[list[str]] = None,
                 save_arrays: bool = True, nan_only: bool = False):
        self.out_dir = Path(out_dir)
        self.points = set(points) if points else None  # None = all points
        self.save_arrays = save_arrays
        # nan_only: the per-module NaN debug hooks analog (reference
        # trainer.py:1904-1926 module forward hooks). Each probe point taps a
        # SCALAR all-isfinite reduce instead of the tensor — cheap enough to
        # leave on for whole runs; non-finite points are logged with their
        # module-point name.
        self.nan_only = nan_only
        self.records: dict[str, dict] = {}
        self.nan_points: list[str] = []
        self._counter = 0

    def wants(self, name: str) -> bool:
        return self.points is None or name in self.points

    def _record(self, name: str, value: np.ndarray) -> None:
        self._counter += 1
        stats = {
            "shape": list(value.shape),
            "dtype": str(value.dtype),
            "mean": float(np.mean(value)),
            "std": float(np.std(value)),
            "absmax": float(np.max(np.abs(value))),
            "has_nan": bool(np.isnan(value).any()),
        }
        self.records[name] = stats
        if self.save_arrays:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            np.save(self.out_dir / f"{self._counter:04d}-{name.replace('/', '_')}.npy", value)

    def __enter__(self) -> "Prober":
        global _ACTIVE
        with _LOCK:
            _ACTIVE = self
        return self

    def __exit__(self, *exc) -> None:
        global _ACTIVE
        with _LOCK:
            _ACTIVE = None

    def summary(self) -> dict[str, dict]:
        for name, stats in self.records.items():
            flag = " !! NaN" if stats["has_nan"] else ""
            logger.info(f"[probe {name}] shape {stats['shape']} mean {stats['mean']:.4g} "
                        f"std {stats['std']:.4g} absmax {stats['absmax']:.4g}{flag}")
        return self.records


def probe(name: str, value):
    """Call-site tap. No-op (returns value) unless a Prober is active AND
    wants this point at TRACE time."""
    prober = _ACTIVE
    if prober is None or not prober.wants(name):
        return value
    import jax

    if prober.nan_only:
        import jax.numpy as jnp

        def _nan_cb(ok):
            if not bool(ok):
                prober.nan_points.append(name)
                logger.warning(f"[nan-watch] non-finite values at probe point "
                               f"{name!r}")

        jax.debug.callback(_nan_cb, jnp.all(jnp.isfinite(value)))
        return value

    def _cb(v):
        prober._record(name, np.asarray(v))

    jax.debug.callback(_cb, value)
    return value
