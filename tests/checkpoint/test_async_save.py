"""Async checkpoint semantics: save() must not absorb the serialize+write time
into the train loop, commit markers land only after arrays, and an
interrupted (uncommitted) save is invisible to resume (reference
train_engine.py:360-442 daemon + .incomplete-rename commit)."""

import json
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.checkpoint.orbax_io import TrainCheckpointManager


def _tree():
    return {
        "w": jnp.zeros((256, 256), jnp.float32),
        "b": jnp.arange(64, dtype=jnp.float32),
    }


def test_save_returns_before_commit(tmp_path, monkeypatch):
    """With a slowed commit path, save() must return promptly and the commit
    marker must appear only after wait()."""
    mgr = TrainCheckpointManager(tmp_path, async_save=True)
    params, opt = _tree(), _tree()

    orig_wait = mgr._wait_arrays
    gate = threading.Event()

    def slow_wait():
        gate.wait(timeout=10.0)
        orig_wait()

    monkeypatch.setattr(mgr, "_wait_arrays", slow_wait)
    t0 = time.time()
    mgr.save(3, params, opt, train_state={"step": 3})
    elapsed = time.time() - t0
    assert elapsed < 2.0, f"save() blocked for {elapsed:.2f}s"
    # marker must not exist until the (gated) commit thread runs
    assert not (tmp_path / "checkpoints/step-3/train_state.json").exists()
    assert mgr.latest_step() is None
    gate.set()
    mgr.wait()
    assert (tmp_path / "checkpoints/step-3/train_state.json").exists()
    assert mgr.latest_step() == 3


def test_interrupted_save_ignored_on_resume(tmp_path):
    """A step dir without train_state.json (crash mid-save) is not listed and
    restore falls back to the last committed step."""
    mgr = TrainCheckpointManager(tmp_path, async_save=False)
    params, opt = _tree(), _tree()
    mgr.save(2, params, opt, train_state={"step": 2})
    # simulate a crash: arrays written for step 4 but no commit marker
    fake = tmp_path / "checkpoints/step-4"
    (fake / "params").mkdir(parents=True)
    (fake / "opt_state").mkdir(parents=True)
    assert mgr.list_steps() == [2]
    assert mgr.latest_step() == 2
    restored, _, train_state, _ = mgr.restore(2, params, opt)
    assert train_state["step"] == 2
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored["b"])), np.arange(64, dtype=np.float32))


def test_second_save_joins_first(tmp_path):
    """Back-to-back saves serialize (one in flight) and both commit."""
    mgr = TrainCheckpointManager(tmp_path, max_keep=2, async_save=True)
    params, opt = _tree(), _tree()
    mgr.save(1, params, opt, train_state={"step": 1})
    mgr.save(2, params, opt, train_state={"step": 2})
    mgr.wait()
    assert mgr.list_steps() == [1, 2]
    st = json.loads((tmp_path / "checkpoints/step-2/train_state.json").read_text())
    assert st["step"] == 2
