"""Reward model: pairwise BT loss mechanics on a tiny base model."""

import json

import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.train.reward import RewardTrainer, RewardTrainerConfig


@pytest.mark.slow
def test_reward_trainer_fit(tmp_path):
    path = tmp_path / "pref.jsonl"
    with open(path, "w") as f:
        for i in range(16):
            q = {"role": "user", "content": f"rate response {i}"}
            f.write(json.dumps({
                "chosen": [q, {"role": "assistant", "content": f"great detailed answer {i}"}],
                "rejected": [q, {"role": "assistant", "content": "bad"}],
            }) + "\n")
    cfg = RewardTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        data_path=str(path),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=1),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        pairs_per_step=4,
        max_length=128,
        total_steps=4,
        work_dir=str(tmp_path / "w"),
        exp_name="rm",
    )
    trainer = RewardTrainer(cfg)
    trainer.fit()
    lines = [json.loads(x) for x in (trainer.work_dir / "tracker.jsonl").read_text().splitlines()]
    assert len(lines) == 4
    assert all(np.isfinite(r["total_loss"]) for r in lines)
    # the model should start separating chosen/rejected within a few steps
    assert lines[-1]["total_loss"] < lines[0]["total_loss"] + 0.1
