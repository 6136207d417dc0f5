"""Advantage estimators.

Reference: xtuner/v1/rl/advantage/ (grpo.py:8 group-normalized, Dr.GRPO, RLOO,
OPO — config.py:21-108). All host-side numpy over reward groups.
"""

from __future__ import annotations

import numpy as np


def grpo_advantage(rewards: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    """rewards: (G,) for one prompt group -> group-normalized advantages."""
    mean = rewards.mean()
    std = rewards.std()
    return (rewards - mean) / (std + eps)


def dr_grpo_advantage(rewards: np.ndarray, **_) -> np.ndarray:
    """Dr.GRPO: mean-centered only (no std division — removes length bias)."""
    return rewards - rewards.mean()


def rloo_advantage(rewards: np.ndarray, **_) -> np.ndarray:
    """Leave-one-out baseline."""
    g = len(rewards)
    if g < 2:
        return rewards - rewards.mean()
    total = rewards.sum()
    baseline = (total - rewards) / (g - 1)
    return rewards - baseline


def opo_advantage(rewards: np.ndarray, lengths: np.ndarray | None = None, **_) -> np.ndarray:
    """OPO: optimal length-weighted baseline."""
    if lengths is None:
        return rewards - rewards.mean()
    w = lengths / np.maximum(lengths.sum(), 1)
    return rewards - (rewards * w).sum()


_ESTIMATORS = {
    "grpo": grpo_advantage,
    "dr_grpo": dr_grpo_advantage,
    "rloo": rloo_advantage,
    "opo": opo_advantage,
}


def compute_advantage(rewards: np.ndarray, estimator: str = "grpo", **kw) -> np.ndarray:
    if estimator not in _ESTIMATORS:
        raise KeyError(f"Unknown advantage estimator {estimator!r}; known {sorted(_ESTIMATORS)}")
    return _ESTIMATORS[estimator](np.asarray(rewards, np.float32), **kw)
