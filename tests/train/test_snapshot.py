"""Snapshot checkpoints: faster cadence, newer snapshot wins on resume."""

import json

import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.train.trainer import Trainer, TrainerConfig


def make_cfg(tmp_path, data, **kw):
    defaults = dict(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128)),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path=str(data))], pack_max_length=128),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=1),
        mesh_cfg=MeshConfig(fsdp_size=2, sp_size=4, param_dtype="float32"),
        global_batch_rows=2, micro_batch_rows=2,
        work_dir=str(tmp_path / "w"), exp_name="s",
    )
    defaults.update(kw)
    return TrainerConfig(**defaults)


@pytest.mark.slow
def test_snapshot_resume_beats_older_checkpoint(tmp_path):
    data = tmp_path / "d.jsonl"
    with open(data, "w") as f:
        for i in range(32):
            f.write(json.dumps({"messages": [
                {"role": "user", "content": f"q {i}"},
                {"role": "assistant", "content": f"a {i} " * 4}]}) + "\n")

    cfg = make_cfg(tmp_path, data, total_steps=7, checkpoint_interval=4,
                   snapshot_interval=2)
    Trainer(cfg).fit()
    # full ckpt at 4 and 7(final); snapshots at 2,4,6 (max_keep 1 -> 6)
    t2 = Trainer(make_cfg(tmp_path, data, total_steps=9, checkpoint_interval=4,
                          snapshot_interval=2, resume=True))
    assert t2.start_step == 7  # final full checkpoint is newest
    # wipe full ckpts; snapshot should drive resume
    import shutil
    shutil.rmtree(t2.work_dir / "checkpoints")
    t3 = Trainer(make_cfg(tmp_path, data, total_steps=9, checkpoint_interval=None,
                          snapshot_interval=2, resume=True))
    assert t3.start_step == 6
