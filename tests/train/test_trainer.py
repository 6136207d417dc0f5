"""End-to-end Trainer: toy tokenizer + tiny model on a real jsonl file,
checkpoint + resume (reference test strategy: tests/train/test_trainer.py
with FakeEngine + toy tokenizer, SURVEY.md §4.5)."""

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


@pytest.fixture
def data_file(tmp_path):
    path = tmp_path / "chat.jsonl"
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(64):
            msg = {
                "messages": [
                    {"role": "user", "content": f"question number {i}?"},
                    {"role": "assistant", "content": f"the answer is {i * 7} indeed " * (1 + i % 3)},
                ]
            }
            f.write(json.dumps(msg) + "\n")
    return path


def make_cfg(data_file, tmp_path, **kw):
    defaults = dict(
        model_cfg=DenseConfig(
            vocab_size=300,
            num_hidden_layers=2,
            hidden_size=32,
            intermediate_size=64,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path=str(data_file))],
            pack_max_length=128,
        ),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=1),
        mesh_cfg=MeshConfig(fsdp_size=2, sp_size=4, param_dtype="float32"),
        global_batch_rows=2,
        micro_batch_rows=2,
        total_steps=5,
        work_dir=str(tmp_path / "work"),
        exp_name="t",
        checkpoint_interval=3,
    )
    defaults.update(kw)
    return TrainerConfig(**defaults)


@pytest.mark.slow
def test_fit_and_tracker(data_file, tmp_path):
    trainer = Trainer(make_cfg(data_file, tmp_path))
    trainer.fit()
    tracker = trainer.work_dir / "tracker.jsonl"
    lines = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(lines) >= 5
    assert lines[-1]["reduced_llm_loss"] < lines[0]["reduced_llm_loss"]
    assert (trainer.work_dir / "checkpoints" / "step-5" / "train_state.json").exists()


@pytest.mark.slow
def test_resume(data_file, tmp_path):
    cfg = make_cfg(data_file, tmp_path, total_steps=3, checkpoint_interval=3)
    Trainer(cfg).fit()
    cfg2 = make_cfg(data_file, tmp_path, total_steps=5, resume=True)
    t2 = Trainer(cfg2)
    assert t2.start_step == 3
    t2.fit()
    assert (t2.work_dir / "checkpoints" / "step-5" / "train_state.json").exists()


@pytest.mark.slow
def test_selective_resume(data_file, tmp_path):
    """load_optimizer_states=False: weights restored, optimizer state fresh
    (reference arguments.py load_model/load_optimizer_states/load_dataset)."""
    import jax
    import jax.numpy as jnp

    cfg = make_cfg(data_file, tmp_path, total_steps=3, checkpoint_interval=3)
    t1 = Trainer(cfg)
    t1.fit()
    p_saved = jax.tree.leaves(t1.engine.params)[0]

    cfg2 = make_cfg(data_file, tmp_path, total_steps=5, resume=True,
                    load_optimizer_states=False, load_dataset=False)
    t2 = Trainer(cfg2)
    assert t2.start_step == 3
    # weights came from the checkpoint
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(t2.engine.params)[0]),
                               np.asarray(p_saved), rtol=1e-6)
    # optimizer state untouched (fresh zeros moments)
    mu = [x for x in jax.tree.leaves(t2.engine.opt_state)
          if hasattr(x, "shape") and x.ndim > 0]
    assert all(float(jnp.abs(m).sum()) == 0.0 for m in mu)

    cfg3 = make_cfg(data_file, tmp_path, total_steps=5, resume=True,
                    load_model=False)
    t3 = Trainer(cfg3)
    # weights NOT restored -> fresh init differs from the checkpoint
    assert not np.allclose(np.asarray(jax.tree.leaves(t3.engine.params)[0]),
                           np.asarray(p_saved))
