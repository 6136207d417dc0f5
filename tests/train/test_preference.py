"""DPO/ORPO: loss semantics + e2e trainer mechanics."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.train.preference import (DPOLossConfig, PreferenceTrainer,
                                         PreferenceTrainerConfig, dpo_pair_loss,
                                         orpo_pair_loss)


def test_dpo_loss_prefers_chosen():
    cfg = DPOLossConfig(beta=0.1)
    ref = jnp.asarray([-10.0]), jnp.asarray([-10.0])
    # policy already prefers chosen -> lower loss than the reverse
    good, m1 = dpo_pair_loss(jnp.asarray([-8.0]), jnp.asarray([-12.0]), *ref, cfg)
    bad, m2 = dpo_pair_loss(jnp.asarray([-12.0]), jnp.asarray([-8.0]), *ref, cfg)
    assert float(good) < float(bad)
    assert float(m1["reward_acc"]) == 1.0 and float(m2["reward_acc"]) == 0.0
    # gradient: increasing chosen logprob decreases loss
    g = jax.grad(lambda pc: dpo_pair_loss(pc, jnp.asarray([-10.0]), *ref, cfg)[0])(
        jnp.asarray([-10.0]))
    assert float(g[0]) < 0


def test_orpo_loss_prefers_chosen():
    cfg = DPOLossConfig(loss_type="orpo", orpo_lambda=0.5)
    good, _ = orpo_pair_loss(jnp.asarray([-1.0]), jnp.asarray([-3.0]), jnp.asarray([1.0]), cfg)
    bad, _ = orpo_pair_loss(jnp.asarray([-3.0]), jnp.asarray([-1.0]), jnp.asarray([3.0]), cfg)
    assert float(good) < float(bad)


@pytest.fixture
def pref_data(tmp_path):
    path = tmp_path / "pref.jsonl"
    with open(path, "w") as f:
        for i in range(16):
            q = {"role": "user", "content": f"pick a number like {i}"}
            f.write(json.dumps({
                "chosen": [q, {"role": "assistant", "content": f"certainly: {i}"}],
                "rejected": [q, {"role": "assistant", "content": "no idea whatsoever"}],
            }) + "\n")
    return path


@pytest.mark.parametrize("loss_type", ["dpo", "orpo"])
@pytest.mark.slow
def test_preference_trainer_fit(pref_data, tmp_path, loss_type):
    cfg = PreferenceTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        data_path=str(pref_data),
        loss_cfg=DPOLossConfig(loss_type=loss_type),
        optim_cfg=AdamWConfig(lr=1e-4),
        lr_cfg=LRConfig(warmup_steps=1),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        pairs_per_step=4,
        max_length=128,
        total_steps=3,
        work_dir=str(tmp_path / "w"),
        exp_name=loss_type,
    )
    trainer = PreferenceTrainer(cfg)
    trainer.fit()
    lines = [json.loads(x) for x in (trainer.work_dir / "tracker.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    assert all(np.isfinite(r["total_loss"]) for r in lines)
    if loss_type == "dpo":
        assert all(0 <= r["reward_acc"] <= 1 for r in lines)
