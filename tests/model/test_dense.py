"""Dense model: shapes, grads, sharding under an 8-device mesh, loss-layout
invariance (the reference's test_global_loss_reduction analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig, build_loss_weights
from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params, param_shardings, count_params
from xtuner_tpu.parallel import MeshConfig, build_mesh
from xtuner_tpu.parallel.sharding import ShardCtx


def tiny_cfg(**kw):
    defaults = dict(
        vocab_size=128,
        num_hidden_layers=2,
        hidden_size=32,
        intermediate_size=64,
        max_position_embeddings=256,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8, qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=16),
    )
    defaults.update(kw)
    return DenseConfig(**defaults)


def make_batch(rng, b=2, l=32, vocab=128):
    ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
    seg = np.ones((b, l), np.int32)
    seg[:, l // 2:] = 2  # two docs per row
    pos = np.concatenate([np.arange(l // 2), np.arange(l - l // 2)])[None, :].repeat(b, 0).astype(np.int32)
    ctx = SequenceContext(input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
                          position_ids=jnp.asarray(pos))
    labels = np.roll(ids, -1, axis=1)
    labels[:, -1] = -100
    return ctx, labels


def test_forward_and_loss():
    cfg = tiny_cfg()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    assert count_params(model.param_specs()) > 0
    ctx, labels = make_batch(np.random.default_rng(0))
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    assert hidden.shape == (2, 32, 32)
    weights = (labels != -100).astype(np.float32)
    out = model.loss(params, ctx, jnp.asarray(labels), jnp.asarray(weights),
                     jnp.sum(weights), compute_dtype=jnp.float32)
    loss = float(out.loss)
    # random init -> loss near ln(vocab)
    assert abs(loss - np.log(cfg.vocab_size)) < 1.0


def test_grads_flow_everywhere():
    cfg = tiny_cfg(tie_word_embeddings=True)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    ctx, labels = make_batch(np.random.default_rng(1))
    weights = (labels != -100).astype(np.float32)

    def loss_fn(p):
        return model.loss(p, ctx, jnp.asarray(labels), jnp.asarray(weights),
                          jnp.sum(weights), compute_dtype=jnp.float32).loss

    grads = jax.grad(loss_fn)(params)
    norms = jax.tree.map(lambda g: float(jnp.linalg.norm(g)), grads)
    for path, n in jax.tree_util.tree_flatten_with_path(norms)[0]:
        assert np.isfinite(n), f"non-finite grad at {path}"
        assert n > 0, f"zero grad at {path}"


def test_chunked_eq_eager_loss():
    cfg_chunk = tiny_cfg(lm_loss_cfg=CELossConfig(mode="chunk", chunk_size=16))
    cfg_eager = tiny_cfg(lm_loss_cfg=CELossConfig(mode="eager"))
    model_c, model_e = cfg_chunk.build(), cfg_eager.build()
    params = init_params(model_c.param_specs(), jax.random.key(2))
    ctx, labels = make_batch(np.random.default_rng(2))
    weights = (labels != -100).astype(np.float32)
    args = (ctx, jnp.asarray(labels), jnp.asarray(weights), jnp.sum(weights))
    l_c = model_c.loss(params, *args, compute_dtype=jnp.float32).loss
    l_e = model_e.loss(params, *args, compute_dtype=jnp.float32).loss
    np.testing.assert_allclose(float(l_c), float(l_e), rtol=1e-6)


def test_sharded_forward_8dev():
    assert len(jax.devices()) == 8
    mesh_cfg = MeshConfig(fsdp_size=4, sp_size=2)
    mesh = build_mesh(mesh_cfg)
    rules = mesh_cfg.rules()
    cfg = tiny_cfg()
    model = cfg.build()
    specs = model.param_specs()
    params = init_params(specs, jax.random.key(3))
    shardings = param_shardings(specs, mesh, rules)
    params = jax.device_put(params, shardings)
    sc = ShardCtx(mesh, rules)
    ctx, labels = make_batch(np.random.default_rng(3), b=4, l=32)
    weights = (labels != -100).astype(np.float32)

    @jax.jit
    def step(p, c, lab, w):
        return model.loss(p, c, lab, w, jnp.sum(w), sc=sc, compute_dtype=jnp.float32).loss

    sharded_loss = step(params, ctx, jnp.asarray(labels), jnp.asarray(weights))
    # compare vs unsharded
    params_local = jax.device_get(params)
    single = model.loss(jax.tree.map(jnp.asarray, params_local), ctx, jnp.asarray(labels),
                        jnp.asarray(weights), jnp.sum(weights), compute_dtype=jnp.float32).loss
    np.testing.assert_allclose(float(sharded_loss), float(single), rtol=1e-5)
