"""Noaux (aux-loss-free) router bias update: the e_score_correction_bias
buffer must move post-step from expert load and drive load toward uniform
(reference moe.update_bias, moe.py:296-361; wired in engine/train_engine.py)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.model.deepseek import deepseek_v3_tiny
from xtuner_tpu.parallel.mesh import MeshConfig


def _engine(steps=60):
    cfg = deepseek_v3_tiny(balancing_loss_coef=0.0, z_loss_coef=0.0)
    assert cfg.router.router_type == "noaux"
    mesh_cfg = MeshConfig(fsdp_size=1, dp_size=-1)
    eng = TrainEngine(cfg, AdamWConfig(lr=0.0, weight_decay=0.0), LRConfig(warmup_steps=1),
                      mesh_cfg, total_steps=steps)
    eng.init_random(0)
    return cfg, eng


@pytest.mark.slow
def test_bias_moves_and_load_converges():
    cfg, eng = _engine()
    # skewed token stream: a tiny id range makes the router concentrate on a
    # few experts, so the bias must push load back toward uniform
    rng = np.random.default_rng(0)
    b, l = 8, 64
    ids = rng.integers(1, 4, (b, l)).astype(np.int32)
    labels = np.roll(ids, -1, 1)
    labels[:, -1] = -100
    batch = {
        "input_ids": ids[None],
        "segment_ids": np.ones((1, b, l), np.int32),
        "position_ids": np.tile(np.arange(l, dtype=np.int32), (1, b, 1)),
        "shifted_labels": labels[None],
        "loss_weights": (labels != -100).astype(np.float32)[None],
    }

    bias0 = np.asarray(jax.device_get(
        eng.params["moe_layers"]["router"]["e_score_correction_bias"]))
    m1 = eng.train_step(batch, step=1)
    vio_first = float(m1["maxvio"])
    for s in range(2, 41):
        m = eng.train_step(batch, step=s)
    vio_last = float(m["maxvio"])
    bias1 = np.asarray(jax.device_get(
        eng.params["moe_layers"]["router"]["e_score_correction_bias"]))

    assert not np.allclose(bias0, bias1), "correction bias never moved"
    # lr=0 so ONLY the bias update can change routing; imbalance must shrink
    assert vio_last < vio_first - 0.1, (vio_first, vio_last)


@pytest.mark.slow
def test_bias_is_not_gradient_trained():
    """With the update wired, the bias must still receive no gradient update
    (it is a buffer): zero update_speed => bias stays exactly zero."""
    cfg = deepseek_v3_tiny()
    cfg = cfg.model_copy(update={
        "router": cfg.router.model_copy(update={"bias_update_speed": 0.0})})
    eng = TrainEngine(cfg, AdamWConfig(lr=1e-3), LRConfig(warmup_steps=1),
                      MeshConfig(fsdp_size=1, dp_size=-1), total_steps=5)
    eng.init_random(0)
    flat = fake_collator(8, 64, cfg.vocab_size, seed=1)
    batch = {k: v[None] for k, v in flat.items()}
    for s in range(1, 4):
        eng.train_step(batch, step=s)
    bias = np.asarray(jax.device_get(
        eng.params["moe_layers"]["router"]["e_score_correction_bias"]))
    np.testing.assert_array_equal(bias, np.zeros_like(bias))
