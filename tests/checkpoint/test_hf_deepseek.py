"""DeepSeek-V3 HF logits parity: locks the MLA rope convention (interleaved
rope dims, reference mla.py:158-161 / HF rope_interleave=True), the noaux
router math, shared experts, and the MLA key mapping end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.checkpoint.hf import load_hf_checkpoint, save_hf_checkpoint
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.model.deepseek import deepseek_config_from_hf
from xtuner_tpu.module.params import param_shardings
from xtuner_tpu.parallel import MeshConfig, build_mesh


@pytest.fixture(scope="module")
def hf_dsv3_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers.models.deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=16,
        num_hidden_layers=3,
        first_k_dense_replace=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        q_lora_rank=16,
        kv_lora_rank=8,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=2,
        topk_group=1,
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(0)
    model = DeepseekV3ForCausalLM(cfg).eval()
    # non-trivial correction bias so the biased-selection path is exercised
    with torch.no_grad():
        for layer in model.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    out = tmp_path_factory.mktemp("hf_dsv3")
    model.save_pretrained(out, safe_serialization=True)
    cfg.save_pretrained(out)
    return out, model


def test_deepseek_logits_parity(hf_dsv3_dir):
    import torch
    from transformers import AutoConfig

    hf_dir, hf_model = hf_dsv3_dir
    our_cfg = deepseek_config_from_hf(AutoConfig.from_pretrained(hf_dir))
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


def test_deepseek_save_roundtrip(hf_dsv3_dir, tmp_path):
    from transformers import AutoConfig

    hf_dir, _ = hf_dsv3_dir
    our_cfg = deepseek_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    model = our_cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig()
    mesh = build_mesh(mesh_cfg)
    shardings = param_shardings(specs, mesh, mesh_cfg.rules())
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(), shardings)

    out_dir = tmp_path / "dsv3_export"
    save_hf_checkpoint(out_dir, params, model.hf_key_map(), our_cfg)
    params2 = load_hf_checkpoint(out_dir, specs, model.hf_key_map(), shardings)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
