"""End-to-end GRPO colocate trainer on a tiny model (mechanics, not learning)."""

import json

import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
from xtuner_tpu.rl.trainer import RLColocateTrainer, RLTrainerConfig


@pytest.fixture
def prompts_file(tmp_path):
    path = tmp_path / "prompts.jsonl"
    with open(path, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "prompt": f"What is {i} plus {i}?",
                "label": f"#### {2 * i}",
            }) + "\n")
    return path


def test_rl_fit_mechanics(prompts_file, tmp_path):
    cfg = RLTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            eos_token_id=258,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        prompts_path=str(prompts_file),
        optim_cfg=AdamWConfig(lr=1e-4),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        loss_cfg=GRPOLossConfig(cliprange_low=0.2, cliprange_high=0.2),
        gen_cfg=GenerateConfig(max_new_tokens=8, temperature=1.0, eos_token_id=258),
        group_size=4,
        prompts_per_step=2,
        total_steps=3,
        max_prompt_length=56,
        work_dir=str(tmp_path / "work"),
        exp_name="rl_t",
    )
    trainer = RLColocateTrainer(cfg)
    trainer.fit()
    tracker = trainer.work_dir / "tracker.jsonl"
    lines = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(lines) == 3
    for rec in lines:
        assert np.isfinite(rec["pg_loss"])
        assert np.isfinite(rec["grad_norm"])
        assert 0.0 <= rec["mean_reward"] <= 1.0
        assert rec["ratio_mean"] > 0
