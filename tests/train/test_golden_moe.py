"""MoE golden loss-curve regression on an (fsdp, ep) mesh — the CI golden-
metric pattern applied to the flagship model family (ci/scripts/test_sft_trainer.py)."""

import pytest
import json

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.testing import check_loss_curve, check_tracker_metrics
from xtuner_tpu.train.trainer import Trainer, TrainerConfig

GOLDEN_LOSS = [5.722591, 5.722079, 5.552025, 5.319508, 5.186933, 5.129955, 5.065163, 5.01295]
GOLDEN_GRAD_NORM = [4.849581, 4.850163, 4.241615, 3.429038, 3.050659, 2.709614, 2.698978, 2.788625]


@pytest.mark.slow
def test_moe_golden_curve(tmp_path):
    cfg = TrainerConfig(
        model_cfg=MoEConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=32, n_routed_experts=8, num_experts_per_tok=2,
            balancing_loss_coef=0.01, z_loss_coef=0.001,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16),
            lm_loss_cfg=CELossConfig(chunk_size=256)),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path="examples/demo_data/alpaca_demo.jsonl")],
            pack_max_length=256),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=2),
        mesh_cfg=MeshConfig(fsdp_size=2, ep_size=4, param_dtype="float32"),
        global_batch_rows=8, micro_batch_rows=8, total_steps=8,
        work_dir=str(tmp_path), exp_name="g", seed=0)
    t = Trainer(cfg)
    t.fit()
    lines = [json.loads(x) for x in (t.work_dir / "tracker.jsonl").read_text().splitlines()]
    check_loss_curve([r["reduced_llm_loss"] for r in lines], GOLDEN_LOSS,
                     cos_tol=1e-6, rtol=1e-4)
    check_tracker_metrics(t.work_dir / "tracker.jsonl",
                          {"reduced_llm_loss": GOLDEN_LOSS, "grad_norm": GOLDEN_GRAD_NORM},
                          {"reduced_llm_loss": 0.01, "grad_norm": 0.02})
