"""EP ragged all-to-all dispatcher == GSPMD dispatcher (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params, param_shardings
from xtuner_tpu.parallel import MeshConfig, build_mesh
from xtuner_tpu.parallel.sharding import ShardCtx


def cfg_with(dispatcher):
    return MoEConfig(
        vocab_size=128,
        num_hidden_layers=2,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=32,
        n_routed_experts=8,
        num_experts_per_tok=2,
        balancing_loss_coef=0.01,
        dispatcher=dispatcher,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


@pytest.mark.parametrize("mesh_kw", [
    dict(fsdp_size=2, ep_size=4),
    dict(fsdp_size=1, ep_size=4, sp_size=2),
])
def test_a2a_matches_gspmd(mesh_kw):
    mesh_cfg = MeshConfig(**mesh_kw)
    mesh = build_mesh(mesh_cfg)
    rules = mesh_cfg.rules()
    sc = ShardCtx(mesh, rules)

    rng = np.random.default_rng(0)
    b, l = 4, 32
    ids = rng.integers(1, 128, (b, l)).astype(np.int32)
    ctx = SequenceContext(
        input_ids=jnp.asarray(ids),
        segment_ids=jnp.ones((b, l), jnp.int32),
        position_ids=jnp.tile(jnp.arange(l, dtype=jnp.int32), (b, 1)),
    )
    labels = np.roll(ids, -1, 1); labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(weights), jnp.sum(weights))

    results = {}
    for disp in ("gspmd", "a2a", "agrs"):
        cfg = cfg_with(disp)
        model = cfg.build()
        specs = model.param_specs()
        params = jax.device_put(init_params(specs, jax.random.key(0)),
                                param_shardings(specs, mesh, rules))

        @jax.jit
        def f(p):
            out = model.loss(p, ctx, *args, sc=sc, compute_dtype=jnp.float32)
            return out.total_loss()

        results[disp] = float(f(params))
    np.testing.assert_allclose(results["a2a"], results["gspmd"], rtol=1e-5)
    np.testing.assert_allclose(results["agrs"], results["gspmd"], rtol=1e-5)


@pytest.mark.slow
def test_a2a_grads_match_gspmd():
    mesh_cfg = MeshConfig(fsdp_size=2, ep_size=4)
    mesh = build_mesh(mesh_cfg)
    rules = mesh_cfg.rules()
    sc = ShardCtx(mesh, rules)
    rng = np.random.default_rng(1)
    b, l = 4, 16
    ids = rng.integers(1, 128, (b, l)).astype(np.int32)
    ctx = SequenceContext(
        input_ids=jnp.asarray(ids), segment_ids=jnp.ones((b, l), jnp.int32),
        position_ids=jnp.tile(jnp.arange(l, dtype=jnp.int32), (b, 1)))
    labels = np.roll(ids, -1, 1); labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(weights), jnp.sum(weights))

    grads = {}
    for disp in ("gspmd", "a2a"):
        cfg = cfg_with(disp)
        model = cfg.build()
        specs = model.param_specs()
        params = jax.device_put(init_params(specs, jax.random.key(2)),
                                param_shardings(specs, mesh, rules))

        @jax.jit
        def g(p):
            return jax.grad(lambda q: model.loss(q, ctx, *args, sc=sc,
                                                 compute_dtype=jnp.float32).total_loss())(p)

        grads[disp] = jax.device_get(g(params))
    for a, b_ in zip(jax.tree.leaves(grads["a2a"]), jax.tree.leaves(grads["gspmd"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-5)
