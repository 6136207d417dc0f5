"""Cross-framework training parity: our engine vs torch/HF AdamW.

The reference's ground-truth standard (SURVEY.md §4.2/4.3): same init, same
data, same hyperparameters -> the loss curve must match the torch
implementation. This exercises the full semantic chain: HF load, forward
(attention/rope/norm), shifted-label CE with token calibration, grad-accum,
global-norm clipping, AdamW.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.checkpoint.hf import load_hf_checkpoint
from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.qwen import dense_config_from_hf
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.testing import check_loss_curve

LR = 1e-3
CLIP = 1.0
STEPS = 5


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, tie_word_embeddings=False, rope_theta=10000.0)
    torch.manual_seed(0)
    out = tmp_path_factory.mktemp("hf_parity")
    Qwen3ForCausalLM(cfg).save_pretrained(out, safe_serialization=True)
    cfg.save_pretrained(out)
    return out


def make_batches(steps=STEPS, b=2, l=32, vocab=128):
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(steps):
        ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
        labels = np.roll(ids, -1, 1).astype(np.int64)
        labels[:, -1] = -100
        batches.append((ids, labels))
    return batches


def torch_losses(hf_dir, batches):
    import torch
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(hf_dir, torch_dtype=torch.float32)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=0.0)
    losses = []
    for ids, labels in batches:
        opt.zero_grad()
        out = model(input_ids=torch.tensor(ids, dtype=torch.long))
        logits = out.logits[:, :-1]
        tgt = torch.tensor(labels[:, :-1], dtype=torch.long)
        loss = torch.nn.functional.cross_entropy(
            logits.reshape(-1, logits.shape[-1]), tgt.reshape(-1), ignore_index=-100)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def ours_losses(hf_dir, batches):
    cfg = dense_config_from_hf(__import__("transformers").AutoConfig.from_pretrained(hf_dir))
    cfg = cfg.model_copy(update={"lm_loss_cfg": CELossConfig(mode="eager")})
    eng = TrainEngine(cfg, AdamWConfig(lr=LR, weight_decay=0.0, max_grad_norm=CLIP),
                      LRConfig(lr_type="constant", warmup_steps=0),
                      MeshConfig(fsdp_size=2, sp_size=4, param_dtype="float32"),
                      total_steps=STEPS)
    eng.params = load_hf_checkpoint(hf_dir, eng.specs, eng.model.hf_key_map(), eng.shardings)
    eng.init_optimizer()
    losses = []
    for ids, labels in batches:
        b, l = ids.shape
        weights = (labels != -100).astype(np.float32)
        batch = {
            "input_ids": ids[None],
            "segment_ids": np.ones((1, b, l), np.int32),
            "position_ids": np.tile(np.arange(l, dtype=np.int32), (1, b, 1)),
            "shifted_labels": labels[None].astype(np.int32),
            "loss_weights": weights[None],
        }
        m = eng.train_step(batch, 1)
        losses.append(float(m["reduced_llm_loss"]))
    return losses


@pytest.mark.slow
def test_training_matches_torch(hf_dir):
    batches = make_batches()
    t = torch_losses(hf_dir, batches)
    o = ours_losses(hf_dir, batches)
    # same init + same updates -> near-identical curves (fp32 both sides)
    check_loss_curve(o, t, cos_tol=1e-6, rtol=1e-3)
