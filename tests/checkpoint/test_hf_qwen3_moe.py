"""Qwen3-MoE (the flagship 30B-A3/235B-A22 architecture) transformers parity:
logits against `Qwen3MoeForCausalLM` + a 5-step training-curve match vs
torch/HF AdamW — the reference's CI golden model is exactly this family
(ref ci/scripts/test_sft_trainer.py:226-259, tests/model/test_qwen3_moe.py).
This torch-anchors the flagship's HF key map (router + per-expert tensors)
AND its training semantics (routing, weighted combine, CE, clip, AdamW)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.checkpoint.hf import load_hf_checkpoint, save_hf_checkpoint
from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.moe import moe_config_from_hf
from xtuner_tpu.module.params import param_shardings
from xtuner_tpu.parallel import MeshConfig, build_mesh
from xtuner_tpu.testing import check_loss_curve

LR = 1e-3
CLIP = 1.0
STEPS = 5


@pytest.fixture(scope="module")
def hf_qwen3_moe_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_moe import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=8,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        router_aux_loss_coef=0.0,  # CE-only training on both sides
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = Qwen3MoeForCausalLM(cfg).eval()
    out = tmp_path_factory.mktemp("hf_qwen3_moe")
    model.save_pretrained(out, safe_serialization=True)
    cfg.save_pretrained(out)
    return out, model


def test_qwen3_moe_logits_parity(hf_qwen3_moe_dir):
    import torch
    from transformers import AutoConfig

    hf_dir, hf_model = hf_qwen3_moe_dir
    our_cfg = moe_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    model = our_cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig(fsdp_size=2, ep_size=2, dp_size=2)
    mesh = build_mesh(mesh_cfg)
    shardings = param_shardings(specs, mesh, mesh_cfg.rules())
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(), shardings)

    ids = np.random.default_rng(0).integers(1, 128, (1, 24)).astype(np.int32)
    ctx = SequenceContext.from_input_ids(ids)
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    logits = np.asarray(hidden @ np.asarray(
        jax.device_get(model.lm_head_weight(params)), np.float32))

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    np.testing.assert_allclose(logits, hf_logits, rtol=3e-4, atol=3e-4)


def test_qwen3_moe_save_roundtrip(hf_qwen3_moe_dir, tmp_path):
    from transformers import AutoConfig

    hf_dir, _ = hf_qwen3_moe_dir
    our_cfg = moe_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    model = our_cfg.build()
    specs = model.param_specs()
    mesh = build_mesh(MeshConfig())
    shardings = param_shardings(specs, mesh, MeshConfig().rules())
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(), shardings)

    out_dir = tmp_path / "qwen3_moe_export"
    save_hf_checkpoint(out_dir, params, model.hf_key_map(), our_cfg)
    params2 = load_hf_checkpoint(out_dir, specs, model.hf_key_map(), shardings)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _make_batches(steps=STEPS, b=4, l=32, vocab=128):
    rng = np.random.default_rng(11)
    batches = []
    for _ in range(steps):
        ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
        labels = np.roll(ids, -1, 1).astype(np.int64)
        labels[:, -1] = -100
        batches.append((ids, labels))
    return batches


def _torch_losses(hf_dir, batches):
    import torch
    from transformers.models.qwen3_moe import Qwen3MoeForCausalLM

    model = Qwen3MoeForCausalLM.from_pretrained(hf_dir, torch_dtype=torch.float32)
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


def _ours_losses(hf_dir, batches):
    from transformers import AutoConfig

    cfg = moe_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    cfg = cfg.model_copy(update={"lm_loss_cfg": CELossConfig(mode="eager"),
                                 "balancing_loss_coef": 0.0})
    eng = TrainEngine(cfg, AdamWConfig(lr=LR, weight_decay=0.0, max_grad_norm=CLIP),
                      LRConfig(lr_type="constant", warmup_steps=0),
                      MeshConfig(fsdp_size=2, ep_size=2, sp_size=2,
                                 param_dtype="float32"),
                      total_steps=STEPS)
    eng.params = load_hf_checkpoint(hf_dir, eng.specs, eng.model.hf_key_map(),
                                    eng.shardings)
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
def test_qwen3_moe_training_matches_torch(hf_qwen3_moe_dir):
    """Same init, same data, same hyperparameters -> the MoE training curve
    must match torch/HF — the reference's loss-curve standard
    (_check_loss_curve, testcase.py:80-100) applied to the flagship family."""
    hf_dir, _ = hf_qwen3_moe_dir
    batches = _make_batches()
    t = _torch_losses(hf_dir, batches)
    o = _ours_losses(hf_dir, batches)
    check_loss_curve(o, t, cos_tol=1e-6, rtol=1e-3)
