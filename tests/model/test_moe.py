"""MoE: dropless dispatch correctness, router semantics, grads, EP-sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params, param_shardings
from xtuner_tpu.module.router import (GreedyRouterConfig, NoAuxRouterConfig, greedy_route,
                                      noaux_route, router_param_specs)
from xtuner_tpu.ops.moe import grouped_gemm, grouped_gemm_reference, permute, unpermute
from xtuner_tpu.parallel import MeshConfig, build_mesh
from xtuner_tpu.parallel.sharding import ShardCtx


def tiny_moe_cfg(**kw):
    defaults = dict(
        vocab_size=128,
        num_hidden_layers=2,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=32,
        n_routed_experts=8,
        num_experts_per_tok=2,
        balancing_loss_coef=0.01,
        z_loss_coef=0.001,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    defaults.update(kw)
    return MoEConfig(**defaults)


def make_batch(rng, b=2, l=32, vocab=128):
    ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
    seg = np.ones((b, l), np.int32)
    pos = np.tile(np.arange(l, dtype=np.int32), (b, 1))
    ctx = SequenceContext(input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
                          position_ids=jnp.asarray(pos))
    labels = np.roll(ids, -1, 1)
    labels[:, -1] = -100
    return ctx, labels


# ----------------------------------------------------------------------
def test_grouped_gemm_matches_reference():
    rng = np.random.default_rng(0)
    e, h, f = 4, 16, 24
    sizes = np.array([5, 0, 9, 2])
    m = sizes.sum()
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, h, f)), jnp.float32)
    out = grouped_gemm(x, w, jnp.asarray(sizes, jnp.int32))
    ref = grouped_gemm_reference(x, w, jnp.asarray(sizes, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_permute_unpermute_roundtrip():
    rng = np.random.default_rng(1)
    n, k, e, h = 16, 2, 4, 8
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (n, k)), jnp.int32)
    weights = jnp.full((n, k), 0.5, jnp.float32)
    info = permute(x, idx, e, weights)
    assert int(info.group_sizes.sum()) == n * k
    # identity experts -> unpermute(sum of k copies * 0.5) == x
    out = unpermute(info.sorted_tokens, info, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * k * 0.5, rtol=1e-5)


def test_greedy_router_topk():
    specs = router_param_specs(GreedyRouterConfig(), 16, 8)
    p = init_params(specs, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((10, 16)), jnp.float32)
    out = greedy_route(p, GreedyRouterConfig(), x, 2)
    assert out.topk_idx.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(out.topk_weights.sum(-1)), 1.0, rtol=1e-5)
    # weights positive, idx are argmax-ordered
    assert (np.asarray(out.topk_weights) > 0).all()


def test_noaux_router_bias_changes_selection():
    cfg = NoAuxRouterConfig(n_group=1, topk_group=1)
    specs = router_param_specs(cfg, 16, 8)
    p = init_params(specs, jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((32, 16)), jnp.float32)
    out0 = noaux_route(p, cfg, x, 2)
    # bias one expert heavily -> it must appear in every token's top-k
    p2 = dict(p)
    p2["e_score_correction_bias"] = p["e_score_correction_bias"].at[3].set(100.0)
    out1 = noaux_route(p2, cfg, x, 2)
    assert (np.asarray(out1.topk_idx) == 3).any(axis=-1).all()
    # combine weights ignore the bias (computed from raw scores)
    assert not np.allclose(np.asarray(out0.topk_idx), np.asarray(out1.topk_idx))


def test_moe_forward_loss_grads():
    cfg = tiny_moe_cfg()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    ctx, labels = make_batch(np.random.default_rng(0))
    weights = (labels != -100).astype(np.float32)

    def loss_fn(p):
        out = model.loss(p, ctx, jnp.asarray(labels), jnp.asarray(weights),
                         jnp.sum(weights), compute_dtype=jnp.float32)
        return out.total_loss(), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(out.balancing_loss) > 0
    # all expert weights get gradient (dropless: every token computed)
    g_experts = grads["moe_layers"]["experts"]["gate_proj"]
    assert np.isfinite(np.asarray(g_experts)).all()
    assert float(jnp.linalg.norm(g_experts)) > 0
    g_router = grads["moe_layers"]["router"]["w"]
    assert float(jnp.linalg.norm(g_router)) > 0


def test_first_k_dense_replace():
    cfg = tiny_moe_cfg(first_k_dense_replace=1)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(2))
    assert "dense_layers" in params
    assert params["moe_layers"]["experts"]["gate_proj"].shape[0] == 1  # 2 layers - 1 dense
    ctx, labels = make_batch(np.random.default_rng(1))
    weights = (labels != -100).astype(np.float32)
    out = model.loss(params, ctx, jnp.asarray(labels), jnp.asarray(weights),
                     jnp.sum(weights), compute_dtype=jnp.float32)
    assert np.isfinite(float(out.loss))


def test_moe_sharded_ep_parity():
    """ep=4 sharded loss == unsharded loss (GSPMD EP correctness)."""
    cfg = tiny_moe_cfg()
    model = cfg.build()
    specs = model.param_specs()
    params = init_params(specs, jax.random.key(3))
    ctx, labels = make_batch(np.random.default_rng(2), b=2)
    weights = (labels != -100).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(weights), jnp.sum(weights))

    single = model.loss(params, ctx, *args, compute_dtype=jnp.float32).total_loss()

    mesh_cfg = MeshConfig(fsdp_size=2, ep_size=4)
    mesh = build_mesh(mesh_cfg)
    rules = mesh_cfg.rules()
    shardings = param_shardings(specs, mesh, rules)
    params_sharded = jax.device_put(params, shardings)
    sc = ShardCtx(mesh, rules)

    @jax.jit
    def step(p):
        return model.loss(p, ctx, *args, sc=sc, compute_dtype=jnp.float32).total_loss()

    sharded = step(params_sharded)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-5)
