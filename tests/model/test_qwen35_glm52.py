"""Qwen3.5 hybrid-MoE, GLM-5.2 (DSA-MLA MoE), gated attention, partial
rotary, and FoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import IGNORE_IDX, CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.glm import GLMConfig
from xtuner_tpu.model.hybrid import HybridMoEConfig
from xtuner_tpu.module.attention import MHAConfig, apply_partial_rotary
from xtuner_tpu.module.dsa import DSAConfig
from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.rope import RopeScalingConfig
from xtuner_tpu.module.router import GreedyRouterConfig, NoAuxRouterConfig


def _loss_setup(cfg, seed=0, l=16):
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(seed))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size - 1, (2, l)).astype(np.int32)
    ctx = SequenceContext.from_input_ids(ids)
    labels = np.roll(ids, -1, 1).astype(np.int32)
    labels[:, -1] = IGNORE_IDX
    w = (labels != IGNORE_IDX).astype(np.float32)
    return model, params, ctx, jnp.asarray(labels), jnp.asarray(w)


def tiny_qwen35():
    return HybridMoEConfig(
        vocab_size=160, num_hidden_layers=4, hidden_size=32, intermediate_size=0,
        moe_intermediate_size=16, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1, with_shared_expert_gate=True,
        rms_norm_type="zero_centered", balancing_loss_coef=0.01,
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl", mrope_section=[1, 1, 0]),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                            qk_norm=True, with_gate=True, partial_rotary_factor=0.25,
                            rms_norm_type="zero_centered"),
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8),
        router=GreedyRouterConfig(),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


@pytest.mark.slow
def test_qwen35_hybrid_moe_trains():
    cfg = tiny_qwen35()
    model, params, ctx, labels, w = _loss_setup(cfg)
    denom = jnp.sum(w)

    def loss_fn(p):
        return model.loss(p, ctx, labels, w, denom, compute_dtype=jnp.float32).total_loss()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # gated attention + shared-expert gate + GDN all receive gradients
    g = grads["pattern"]
    assert float(jnp.abs(g["p3"]["attn"]["q_proj"]["w"]).max()) > 0  # full attn (w/ gate)
    assert float(jnp.abs(g["p0"]["attn"]["in_proj_qkvz"]["w"]).max()) > 0  # GDN
    assert float(jnp.abs(g["p0"]["shared_expert_gate"]["w"]).max()) > 0
    # one SGD step reduces the loss
    params2 = jax.tree.map(lambda p_, g_: p_ - 0.5 * g_, params, grads)
    assert float(loss_fn(params2)) < float(loss)


def test_qwen35_hf_roundtrip(tmp_path):
    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint, save_hf_checkpoint
    from xtuner_tpu.module.params import param_shardings
    from xtuner_tpu.parallel import MeshConfig, build_mesh

    cfg = tiny_qwen35()
    model, params, ctx, labels, w = _loss_setup(cfg)
    save_hf_checkpoint(tmp_path / "hf", params, model.hf_key_map())
    mesh_cfg = MeshConfig(fsdp_size=2, ep_size=2, sp_size=2)
    mesh = build_mesh(mesh_cfg)
    specs = model.param_specs()
    loaded = load_hf_checkpoint(tmp_path / "hf", specs, model.hf_key_map(),
                                param_shardings(specs, mesh, mesh_cfg.rules()))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def tiny_glm52():
    return GLMConfig(
        vocab_size=160, num_hidden_layers=3, first_k_dense_replace=1,
        hidden_size=32, intermediate_size=48, moe_intermediate_size=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        router=NoAuxRouterConfig(scoring_func="sigmoid", norm_topk_prob=True,
                                 routed_scaling_factor=2.5),
        attention=DSAConfig(num_attention_heads=4, q_lora_rank=16, kv_lora_rank=16,
                            qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
                            index_n_heads=2, index_head_dim=8, index_top_k=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


@pytest.mark.slow
def test_glm52_dsa_moe_trains_with_indexer_loss():
    cfg = tiny_glm52()
    model, params, ctx, labels, w = _loss_setup(cfg)
    denom = jnp.sum(w)
    out = model.loss(params, ctx, labels, w, denom, compute_dtype=jnp.float32)
    assert out.dsa_index_loss is not None and np.isfinite(float(out.dsa_index_loss))

    def loss_fn(p):
        return model.loss(p, ctx, labels, w, denom, compute_dtype=jnp.float32).total_loss()

    _, grads = jax.value_and_grad(loss_fn)(params)
    # the lightning indexer's ONLY grad path is the distillation loss — it
    # must be nonzero in both the dense head layer and the moe layers
    assert float(jnp.abs(grads["dense_layers"]["attn"]["idx_q_proj"]["w"]).max()) > 0
    assert float(jnp.abs(grads["moe_layers"]["attn"]["idx_q_proj"]["w"]).max()) > 0


def test_partial_rotary_keeps_pass_dims():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 6, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 6, 2, 16)), jnp.float32)
    ang = rng.standard_normal((1, 6, 2)).astype(np.float32)
    emb = np.concatenate([ang, ang], -1)  # rope_dim = 4
    cos, sin = jnp.cos(jnp.asarray(emb)), jnp.sin(jnp.asarray(emb))
    q2, k2 = apply_partial_rotary(q, k, cos, sin, 4)
    np.testing.assert_array_equal(np.asarray(q2[..., 4:]), np.asarray(q[..., 4:]))
    assert np.abs(np.asarray(q2[..., :4]) - np.asarray(q[..., :4])).max() > 1e-4


def test_fope_identity_equals_plain_rope():
    """fope coefs == exact identity (init_factor=0) with ALL frequencies kept
    -> fope == plain rope."""
    from xtuner_tpu.module.rope import (RopeScalingConfig, fope_cos_sin,
                                        fope_param_specs, rope_cos_sin)

    scaling = RopeScalingConfig(use_fope=True, num_inv_freq=8, fope_init_factor=0.0)
    specs = fope_param_specs(16, 10000.0, scaling, 512)
    fope_params = init_params(specs, jax.random.key(0))  # identity (scale 0)
    pos = jnp.asarray(np.arange(12)[None], jnp.int32)
    cos_f, sin_f = fope_cos_sin(pos, 16, 10000.0, scaling, 512, fope_params)
    cos_r, sin_r = rope_cos_sin(pos, 16, 10000.0)
    np.testing.assert_allclose(np.asarray(cos_f), np.asarray(cos_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_f), np.asarray(sin_r), atol=1e-6)


def test_fope_model_trains_coefs():
    cfg = DenseConfig(
        vocab_size=160, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        max_position_embeddings=256,
        rope_scaling_cfg=RopeScalingConfig(use_fope=True, fope_init_factor=0.1),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model, params, ctx, labels, w = _loss_setup(cfg)
    assert "fope" in params and params["fope"]["sin_coef"].ndim == 2
    denom = jnp.sum(w)

    def loss_fn(p):
        return model.loss(p, ctx, labels, w, denom, compute_dtype=jnp.float32).total_loss()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["fope"]["sin_coef"]).max()) > 0
