"""Host + device memory monitoring.

Reference: xtuner/v1/utils/track_rl_mem.py (RL-phase CUDA/host memory
tracker) + the trainer's per-step CUDA memory stats. TPU analog: host RSS
from /proc/self/status (no psutil dependency) and per-device HBM stats from
PJRT's memory_stats(); `snapshot()` returns a flat dict that rides the
metric writers, `MemoryTracker` logs deltas per named phase.
"""

from __future__ import annotations

import time
from typing import Optional

from .logger import get_logger

logger = get_logger()


def host_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def device_mem_mb() -> dict[str, float]:
    """bytes_in_use / peak per addressable device (PJRT memory_stats)."""
    import jax

    out: dict[str, float] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            continue
        out[f"dev{d.id}_in_use_mb"] = stats.get("bytes_in_use", 0) / 2**20
        if "peak_bytes_in_use" in stats:
            out[f"dev{d.id}_peak_mb"] = stats["peak_bytes_in_use"] / 2**20
    return out


def snapshot(tag: str = "") -> dict[str, float]:
    snap = {"host_rss_mb": host_rss_mb(), **device_mem_mb()}
    if tag:
        snap = {f"mem/{tag}/{k}": v for k, v in snap.items()}
    return snap


class MemoryTracker:
    """Per-phase memory deltas (the track_rl_mem analog): call mark(phase)
    at phase boundaries; logs host/device deltas since the previous mark."""

    def __init__(self, log_every: int = 1):
        self.log_every = log_every
        self._last: Optional[dict[str, float]] = None
        self._last_t = time.time()
        self._n = 0

    def mark(self, phase: str) -> dict[str, float]:
        snap = snapshot()
        self._n += 1
        if self._last is not None and self._n % self.log_every == 0:
            deltas = {k: snap[k] - self._last.get(k, 0.0) for k in snap}
            moved = {k: round(v, 1) for k, v in deltas.items() if abs(v) > 1.0}
            if moved:
                logger.info(f"[mem {phase}] +{time.time() - self._last_t:.1f}s "
                            f"deltas(MB): {moved}")
        self._last, self._last_t = snap, time.time()
        return snap
