"""`offload_attn` remat policy (host-offloaded attention residuals,
reference activation_offload.py analog) executes a real train step.

Wall-clock value is hardware-dependent (this box's device<->host path rides
the axon tunnel, so no perf claim here — see TODO.md); this guards the code
path: save_and_offload_only_these_names compiles and the step converges to
a finite loss."""

import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig


@pytest.mark.slow
def test_offload_attn_policy_runs():
    cfg = DenseConfig(
        vocab_size=300, num_hidden_layers=2, hidden_size=64, intermediate_size=128,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16),
        lm_loss_cfg=CELossConfig(chunk_size=128),
    )
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-4), LRConfig(warmup_steps=1),
                         MeshConfig(fsdp_size=-1, param_dtype="float32",
                                    remat_policy="offload_attn"), total_steps=3)
    engine.init_random(0)
    flat = fake_collator(8, 128, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, 8, 128) for k, v in flat.items()}
    m = engine.train_step(batch, 1)
    assert np.isfinite(float(m["total_loss"]))
