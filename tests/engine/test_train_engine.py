"""TrainEngine: grad-accum invariance, NaN skip, step mechanics on 8-dev mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig


def tiny_model_cfg():
    return DenseConfig(
        vocab_size=64,
        num_hidden_layers=2,
        hidden_size=32,
        intermediate_size=64,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


def make_engine(mesh_cfg=None, lr=1e-3, total_steps=10, mesh=None):
    eng = TrainEngine(
        tiny_model_cfg(), AdamWConfig(lr=lr), LRConfig(warmup_steps=0, lr_type="constant"),
        mesh_cfg or MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32"), total_steps,
        mesh=mesh,
    )
    eng.init_random(0)
    return eng


def batch_of(a, b, l=32, seed=0):
    flat = fake_collator(a * b, l, 64, seed)
    return {k: v.reshape(a, b, l) for k, v in flat.items()}


@pytest.mark.slow
def test_train_step_reduces_loss():
    eng = make_engine()
    batch = batch_of(1, 4)
    losses = []
    for step in range(1, 6):
        m = eng.train_step(batch, step)
        losses.append(float(m["reduced_llm_loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_grad_accum_invariance():
    """1x4 rows == 2x2 rows must give identical loss and near-identical update
    (the reference's loss-calibration invariance, SURVEY.md §4.9)."""
    eng1 = make_engine()
    eng2 = make_engine()
    b1 = batch_of(1, 8, seed=3)
    b2 = {k: v.reshape(2, 4, -1) for k, v in b1.items()}
    m1 = eng1.train_step(b1, 1)
    m2 = eng2.train_step(b2, 1)
    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5)
    p1 = jax.tree.leaves(eng1.params)[0]
    p2 = jax.tree.leaves(eng2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_nan_step_skipped():
    eng = make_engine()
    params_before = jax.tree.map(np.asarray, jax.device_get(eng.params))
    batch = batch_of(1, 4)
    batch["loss_weights"] = batch["loss_weights"] * np.nan
    m = eng.train_step(batch, 1)
    assert int(m["skipped"]) == 1
    params_after = jax.device_get(eng.params)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_engine_matches_single():
    from xtuner_tpu.parallel.mesh import build_mesh
    eng_sharded = make_engine(MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32"))
    single_cfg = MeshConfig(fsdp_size=1, param_dtype="float32")
    single_mesh = build_mesh(single_cfg, jax.devices()[:1])
    eng_single = make_engine(single_cfg, mesh=single_mesh)
    # same init seeds -> same params
    batch = batch_of(2, 4, seed=7)
    m_s = eng_sharded.train_step(batch, 1)
    m_1 = eng_single.train_step(batch, 1)
    np.testing.assert_allclose(float(m_s["reduced_llm_loss"]), float(m_1["reduced_llm_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_s["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-4)


def test_hsdp_engine_matches_single():
    """dp>1 (HSDP replicate axis) x fsdp: same loss/grads as single device
    (VERDICT Weak #11: the dp axis was untested)."""
    from xtuner_tpu.parallel.mesh import build_mesh
    eng_hsdp = make_engine(MeshConfig(dp_size=2, fsdp_size=2, sp_size=2, param_dtype="float32"))
    single_cfg = MeshConfig(fsdp_size=1, param_dtype="float32")
    eng_single = make_engine(single_cfg, mesh=build_mesh(single_cfg, jax.devices()[:1]))
    batch = batch_of(2, 4, seed=11)
    m_h = eng_hsdp.train_step(batch, 1)
    m_1 = eng_single.train_step(batch, 1)
    np.testing.assert_allclose(float(m_h["reduced_llm_loss"]), float(m_1["reduced_llm_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_h["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-4)
    # second step diverges from init -> params actually updated under dp
    m_h2 = eng_hsdp.train_step(batch, 2)
    assert float(m_h2["reduced_llm_loss"]) < float(m_h["reduced_llm_loss"])


@pytest.mark.slow
def test_tp_engine_matches_single():
    """tp>1 (megatron-style head/mlp/vocab sharding): same loss/grads as
    single device (VERDICT Weak #11: the tp axis was untested)."""
    from xtuner_tpu.parallel.mesh import build_mesh
    eng_tp = make_engine(MeshConfig(tp_size=2, fsdp_size=4, param_dtype="float32"))
    single_cfg = MeshConfig(fsdp_size=1, param_dtype="float32")
    eng_single = make_engine(single_cfg, mesh=build_mesh(single_cfg, jax.devices()[:1]))
    batch = batch_of(2, 4, seed=13)
    m_t = eng_tp.train_step(batch, 1)
    m_1 = eng_single.train_step(batch, 1)
    np.testing.assert_allclose(float(m_t["reduced_llm_loss"]), float(m_1["reduced_llm_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_t["grad_norm"]), float(m_1["grad_norm"]), rtol=1e-4)
