"""Per-module activation statistics recorder.

Reference: xtuner/v1/utils/internal_metrics.py (397 LoC,
InternalMetricsRecorder) — forward hooks recording per-module activation
stats (rms/absmax/mean) at a step interval, written to the experiment
tracker. TPU design: reuses the prober's named tap points (zero-cost when
inactive; a fresh trace is needed for the recording step) and keeps only the
summary statistics (no array dumps).
"""

from __future__ import annotations

from typing import Optional

from .prober import Prober


def flatten_stats(records: dict[str, dict]) -> dict[str, float]:
    """Prober records {point: {mean, std, absmax, has_nan, ...}} ->
    {point/stat: value} rows for the experiment tracker."""
    out: dict[str, float] = {}
    for name, rec in records.items():
        for k in ("mean", "std", "absmax"):
            if k in rec:
                out[f"{name}/{k}"] = float(rec[k])
        if rec.get("has_nan"):
            out[f"{name}/has_nan"] = 1.0
    return out


class ActivationStatsRecorder:
    """Record activation stats every `interval` steps.

    Usage:
        rec = ActivationStatsRecorder(interval=100)
        stats = rec.maybe_record(step, lambda: engine.train_step(batch, step))
        # on recording steps: {"after_attn/absmax": ..., ...}; else None
    """

    def __init__(self, interval: int = 100, points: Optional[list[str]] = None,
                 out_dir: str = "/tmp/xtuner_act_stats"):
        self.interval = interval
        self.points = points
        self.out_dir = out_dir
        self.last: Optional[dict[str, float]] = None

    def should_record(self, step: int) -> bool:
        return self.interval > 0 and step % self.interval == 0

    def maybe_record(self, step: int, run_step) -> Optional[dict[str, float]]:
        """run_step: zero-arg callable executing ONE training step. Returns
        the stats dict on recording steps, else None. NOTE: recording
        retraces the step (probe taps are compiled in only while a prober is
        active), so prefer large intervals."""
        if not self.should_record(step):
            run_step()
            return None
        with Prober(self.out_dir, points=self.points, save_arrays=False) as p:
            run_step()
        self.last = flatten_stats(p.records)
        return self.last
