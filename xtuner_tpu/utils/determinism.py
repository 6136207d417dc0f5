"""Determinism controls.

Reference: XTUNER_DETERMINISTIC (trainer.py:1490, v1/__init__.py:5-31 —
seeds, deterministic kernels, fixed triton autotune). JAX/XLA is
deterministic by default on TPU for a fixed program; the remaining knobs are
seeding and disabling nondeterministic XLA reductions.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_deterministic(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_gpu_deterministic_ops" not in os.environ["XLA_FLAGS"]:
        # harmless on TPU; makes CPU/GPU test runs reproducible too
        os.environ["XLA_FLAGS"] += " --xla_gpu_deterministic_ops=true"


def is_deterministic() -> bool:
    return os.environ.get("XTUNER_DETERMINISTIC", "false").lower() in ("1", "true")
