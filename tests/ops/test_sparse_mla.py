"""DSA sparse attention: top_k >= L reduces to dense causal attention;
indexer sparsity actually restricts context; module grads flow."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.module.dsa import DSAConfig, dsa_forward, dsa_param_specs
from xtuner_tpu.module.mla import MLAConfig, mla_forward, mla_param_specs
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.rope import rope_cos_sin
from xtuner_tpu.ops.attention.reference import reference_attention
from xtuner_tpu.ops.sparse_mla import indexer_scores, sparse_gather_attention, topk_select
from xtuner_tpu.parallel.sharding import NULL_SHARD_CTX


def test_full_topk_equals_dense():
    rng = np.random.default_rng(0)
    b, l, h, d = 1, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    seg = jnp.ones((b, l), jnp.int32)
    # trivial indexer: all-ones scores -> top_k=L selects the full causal prefix
    scores = indexer_scores(jnp.ones((b, l, 1, 4)), jnp.ones((b, l, 1, 4)),
                            jnp.ones((b, l, 1)), seg)
    idx = topk_select(scores, l)
    sel_scores = jnp.take_along_axis(scores, idx, axis=-1)
    out_sparse = sparse_gather_attention(q, k, v, idx, sel_scores)
    out_dense = reference_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)


def test_sparsity_restricts_context():
    """top_k=1 with causal scores favoring self -> output == v at each position."""
    rng = np.random.default_rng(1)
    b, l, h, d = 1, 16, 1, 8
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    # scores: diagonal dominant -> each query selects itself
    scores = jnp.where(jnp.eye(l, dtype=bool)[None], 0.0, -jnp.inf)
    idx = topk_select(scores, 1)
    sel = jnp.take_along_axis(scores, idx, axis=-1)
    out = sparse_gather_attention(q, k, v, idx, sel)
    np.testing.assert_allclose(np.asarray(out)[:, :, 0], np.asarray(v)[:, :, 0],
                               rtol=1e-5, atol=1e-5)


def tiny_dsa():
    return DSAConfig(
        num_attention_heads=2, q_lora_rank=16, kv_lora_rank=8,
        qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
        index_n_heads=2, index_head_dim=8, index_top_k=8,
    )


@pytest.mark.slow
def test_dsa_module_grads_and_topk_sharing():
    cfg = tiny_dsa()
    h_size = 32
    specs = dsa_param_specs(cfg, h_size)
    params = init_params(specs, jax.random.key(0))
    rng = np.random.default_rng(2)
    b, l = 1, 24
    x = jnp.asarray(rng.standard_normal((b, l, h_size)), jnp.float32)
    seg = jnp.ones((b, l), jnp.int32)
    pos = jnp.tile(jnp.arange(l, dtype=jnp.int32), (b, 1))
    cos, sin = rope_cos_sin(pos, cfg.qk_rope_head_dim, 10000.0)

    def f(p):
        out, idx, idx_loss = dsa_forward(p, cfg, x, cos, sin, seg, NULL_SHARD_CTX)
        return jnp.sum(out ** 2) + idx_loss, idx

    (loss, idx), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert idx.shape == (b, l, 8)
    # MLA weights trained by the main loss; indexer trained ONLY via the
    # distillation loss (selection itself is discrete)
    for name in ("idx_q_proj", "idx_k_proj", "idx_w_proj", "kv_b_proj"):
        g = grads[name]["w"]
        assert float(jnp.abs(g).sum()) > 0, name

    # cross-layer sharing: reusing select_idx must run and differ from dense
    out2, idx2, _ = dsa_forward(params, cfg, x, cos, sin, seg, NULL_SHARD_CTX,
                                select_idx=idx)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    assert np.isfinite(np.asarray(out2)).all()


def test_dsa_with_full_topk_matches_mla():
    """index_top_k >= L: DSA must equal plain MLA (same weights)."""
    cfg = tiny_dsa().model_copy(update={"index_top_k": 64})
    h_size = 32
    specs = dsa_param_specs(cfg, h_size)
    params = init_params(specs, jax.random.key(1))
    rng = np.random.default_rng(3)
    b, l = 1, 24
    x = jnp.asarray(rng.standard_normal((b, l, h_size)), jnp.float32)
    seg = jnp.ones((b, l), jnp.int32)
    pos = jnp.tile(jnp.arange(l, dtype=jnp.int32), (b, 1))
    cos, sin = rope_cos_sin(pos, cfg.qk_rope_head_dim, 10000.0)

    out_dsa, _, _ = dsa_forward(params, cfg, x, cos, sin, seg, NULL_SHARD_CTX)
    mla_cfg = MLAConfig(**{k: v for k, v in cfg.model_dump().items()
                           if k in MLAConfig.model_fields})
    mla_params = {k: v for k, v in params.items() if not k.startswith("idx_")}
    out_mla = mla_forward(mla_params, mla_cfg, x, cos, sin, seg, NULL_SHARD_CTX,
                          attn_impl="reference")
    np.testing.assert_allclose(np.asarray(out_dsa), np.asarray(out_mla),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dsa_block_granularity():
    """select_granularity='block': Pallas block-sparse path — with every
    causal block selectable (index_top_k >= L) it must match plain MLA, and
    the indexer must receive gradient through the block distillation loss."""
    from xtuner_tpu.module.mla import mla_forward

    cfg = tiny_dsa().model_copy(update={
        "select_granularity": "block", "index_block": 32, "index_top_k": 64})
    h_size = 32
    specs = dsa_param_specs(cfg, h_size)
    params = init_params(specs, jax.random.key(1))
    rng = np.random.default_rng(5)
    b, l = 1, 64
    x = jnp.asarray(rng.standard_normal((b, l, h_size)), jnp.float32)
    seg = jnp.ones((b, l), jnp.int32)
    pos = jnp.tile(jnp.arange(l, dtype=jnp.int32), (b, 1))
    cos, sin = rope_cos_sin(pos, cfg.qk_rope_head_dim, 10000.0)

    def f(p):
        out, idx, idx_loss = dsa_forward(p, cfg, x, cos, sin, seg, NULL_SHARD_CTX)
        return jnp.sum(out ** 2) + idx_loss, (out, idx, idx_loss)

    (loss, (out, idx, idx_loss)), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss)) and np.isfinite(float(idx_loss))
    assert idx.shape == (b, l // 32, 2)
    for name in ("idx_q_proj", "idx_k_proj", "idx_w_proj", "kv_b_proj"):
        assert float(jnp.abs(grads[name]["w"]).sum()) > 0, name

    # all causal blocks selected (top_k >= L) -> equals dense MLA
    out_mla = mla_forward(params, cfg, x, cos, sin, seg, NULL_SHARD_CTX)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_mla),
                               rtol=2e-4, atol=2e-4)
