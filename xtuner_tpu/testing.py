"""Test utilities.

Reference: xtuner/_testing/testcase.py — `_check_loss_curve` (:80-100, the
"same training behavior" standard: cosine similarity >= 1-tol AND mean
relative diff < rtol) and ci/scripts/check_metric.py (tracker-log regression
against golden per-step arrays with per-metric tolerances).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np


def check_loss_curve(actual: Sequence[float], golden: Sequence[float],
                     cos_tol: float = 1e-4, rtol: float = 0.02) -> None:
    """Raises AssertionError unless the curves match the reference standard."""
    a = np.asarray(actual, np.float64)
    g = np.asarray(golden, np.float64)
    assert a.shape == g.shape, f"curve length {a.shape} != golden {g.shape}"
    cos = float(a @ g / (np.linalg.norm(a) * np.linalg.norm(g) + 1e-12))
    assert cos >= 1 - cos_tol, f"cosine similarity {cos:.6f} < {1 - cos_tol}"
    rel = float(np.mean(np.abs(a - g) / (np.abs(g) + 1e-12)))
    assert rel < rtol, f"mean relative diff {rel:.5f} >= {rtol}"


def check_tracker_metrics(tracker_path: str | Path, golden: dict[str, Sequence[float]],
                          tolerances: dict[str, float]) -> None:
    """CI metric regression: compare tracker.jsonl per-step records against
    golden arrays with per-metric relative tolerances (check_metric.py:31-59)."""
    records = [json.loads(x) for x in Path(tracker_path).read_text().splitlines()]
    by_step = {r["step"]: r for r in records}
    steps = sorted(by_step)
    for metric, gold in golden.items():
        tol = tolerances.get(metric, 0.01)
        actual = [by_step[s][metric] for s in steps[: len(gold)]]
        for i, (a, g) in enumerate(zip(actual, gold)):
            rel = abs(a - g) / (abs(g) + 1e-12)
            assert rel <= tol, (
                f"{metric}[step {steps[i]}]: {a} vs golden {g} (rel {rel:.4f} > {tol})"
            )
