"""NaN-watch prober mode + memory monitor."""

import jax
import jax.numpy as jnp

from xtuner_tpu.profiler.prober import Prober, probe
from xtuner_tpu.utils.mem_monitor import MemoryTracker, snapshot


def test_nan_watch_flags_bad_point(tmp_path):
    def f(x):
        x = probe("clean", x)
        x = probe("poisoned", x / 0.0)  # inf
        return jnp.sum(x)

    with Prober(tmp_path, nan_only=True) as p:
        jax.jit(f)(jnp.ones((4,)))
        jax.effects_barrier()
    assert p.nan_points == ["poisoned"]


def test_nan_watch_quiet_when_finite(tmp_path):
    def f(x):
        return jnp.sum(probe("clean", x))

    with Prober(tmp_path, nan_only=True) as p:
        jax.jit(f)(jnp.ones((4,)))
        jax.effects_barrier()
    assert p.nan_points == []


def test_memory_snapshot_and_tracker():
    snap = snapshot("t")
    assert any(k.endswith("host_rss_mb") for k in snap)
    tr = MemoryTracker()
    tr.mark("a")
    out = tr.mark("b")
    assert "host_rss_mb" in out
