"""Step-windowed profiling.

Reference: xtuner/v1/profiler/cuda_profile.py (profiling_time torch.profiler
wrapper + chrome trace export :33-132, profiling_memory snapshot). TPU: the
same window contract over jax.profiler — traces open in XProf/Perfetto/
TensorBoard; memory stats come from device_memory_stats.
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path

import jax

from ..utils.logger import get_logger

logger = get_logger()


@contextlib.contextmanager
def profiling_time(out_dir: str | Path):
    """Trace every device op in the window -> xplane/perfetto files."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out_dir)):
        yield
    logger.info(f"profile trace written to {out_dir}")


@contextlib.contextmanager
def profiling_memory(out_dir: str | Path):
    """Device memory stats before/after the window (the CUDA memory-snapshot
    analog; per-buffer breakdown comes from the xplane trace)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def stats():
        out = {}
        for d in jax.local_devices():
            try:
                s = d.memory_stats()
            except Exception:
                s = None
            if s:
                out[str(d)] = {k: s[k] for k in
                               ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                               if k in s}
        return out

    before = stats()
    yield
    after = stats()
    (out_dir / "memory_stats.json").write_text(
        json.dumps({"before": before, "after": after}, indent=1)
    )
    for dev, s in after.items():
        if "peak_bytes_in_use" in s:
            logger.info(f"{dev}: peak {s['peak_bytes_in_use']/2**30:.2f} GiB "
                        f"of {s.get('bytes_limit', 0)/2**30:.2f} GiB")


class StepProfiler:
    """Trainer hook: trace steps in [start, stop) (reference profile_step
    windows, trainer.py:432,1640-1654)."""

    def __init__(self, out_dir: str | Path, start_step: int, num_steps: int = 1):
        self.out_dir = Path(out_dir)
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if step == self.start_step and not self._active:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.out_dir))
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step + 1 >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            logger.info(f"step profile [{self.start_step},{self.stop_step}) -> {self.out_dir}")
