"""Golden loss-curve regression (reference: ci/scripts/test_sft_trainer.py —
golden per-step arrays + _check_loss_curve similarity standard).

Also the layout-invariance check: a different (mesh, grad-accum) layout must
reproduce the same curve (the reference's loss-calibration guarantee).
"""

import json

import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.testing import check_loss_curve, check_tracker_metrics
from xtuner_tpu.train.trainer import Trainer, TrainerConfig

# golden from the deterministic reference run (seed 0, fp32, CPU 8-dev mesh)
GOLDEN_LOSS = [5.720263, 5.724789, 5.53779, 5.288276, 5.156451, 5.049623,
               4.978324, 4.869121, 4.811565, 4.862221]
GOLDEN_GRAD_NORM = [4.370571, 4.317468, 3.784104, 3.443467, 3.133354, 3.017426,
                    2.903702, 3.119103, 3.181523, 2.742421]


def run_trainer(tmp_path, mesh_cfg, micro_batch_rows):
    cfg = TrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=64, intermediate_size=128,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16),
            lm_loss_cfg=CELossConfig(chunk_size=256)),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path="examples/demo_data/alpaca_demo.jsonl")],
            pack_max_length=256),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=2),
        mesh_cfg=mesh_cfg,
        global_batch_rows=4, micro_batch_rows=micro_batch_rows, total_steps=10,
        work_dir=str(tmp_path), exp_name="g", seed=0)
    t = Trainer(cfg)
    t.fit()
    lines = [json.loads(x) for x in (t.work_dir / "tracker.jsonl").read_text().splitlines()]
    return t, lines


@pytest.mark.slow
def test_golden_curve_reproduces(tmp_path):
    t, lines = run_trainer(tmp_path, MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32"), 4)
    losses = [r["reduced_llm_loss"] for r in lines]
    check_loss_curve(losses, GOLDEN_LOSS, cos_tol=1e-6, rtol=1e-4)
    check_tracker_metrics(t.work_dir / "tracker.jsonl",
                          {"reduced_llm_loss": GOLDEN_LOSS, "grad_norm": GOLDEN_GRAD_NORM},
                          {"reduced_llm_loss": 0.01, "grad_norm": 0.02})


@pytest.mark.slow
def test_layout_invariance_grad_accum(tmp_path):
    """grad-accum 2x2 on a (fsdp=2, sp=2, dp=2) mesh must match the golden
    curve from the 1x4 (fsdp=4, sp=2) run."""
    _, lines = run_trainer(
        tmp_path, MeshConfig(fsdp_size=2, sp_size=4, param_dtype="float32"), 2)
    losses = [r["reduced_llm_loss"] for r in lines]
    check_loss_curve(losses, GOLDEN_LOSS, cos_tol=1e-5, rtol=0.002)
