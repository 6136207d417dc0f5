"""Block-sparse (DSA) pallas attention vs the dense oracle (interpret mode).

Contract: with EVERY causal block selected, block-sparse == dense causal
attention exactly; with a subset, it equals dense attention restricted to the
selected blocks (computed by a jnp oracle here)."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.ops.attention.block_sparse import (
    block_sparse_attention, select_key_blocks)
from xtuner_tpu.ops.attention.reference import reference_attention


def make_inputs(b=1, l=256, hq=4, hkv=2, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, l, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    seg = np.ones((b, l), np.int32)
    seg[:, 200:] = 2  # two documents
    return q, k, v, jnp.asarray(seg)


def all_blocks_idx(b, l, block):
    nq = l // block
    idx = np.full((b, nq, nq), -1, np.int32)
    for i in range(nq):
        idx[:, i, nq - (i + 1):] = np.arange(i + 1)  # ascending, -1 padded front
    return jnp.asarray(idx)


def test_all_blocks_equals_dense():
    q, k, v, seg = make_inputs()
    block = 64
    idx = all_blocks_idx(1, 256, block)
    out_bs = block_sparse_attention(q, k, v, idx, seg, block=block, interpret=True)
    out_ref = reference_attention(q, k, v, seg)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(np.asarray(out_bs)[valid], np.asarray(out_ref)[valid],
                               rtol=3e-5, atol=3e-5)


def test_subset_blocks_matches_oracle():
    q, k, v, seg = make_inputs(seed=1)
    block = 64
    nq = 256 // block
    # each q-block sees only itself and block 0
    idx = np.full((1, nq, 2), -1, np.int32)
    for i in range(nq):
        idx[0, i] = sorted({0, i})[-2:] if i > 0 else [-1, 0]
    idx = jnp.asarray(idx)
    out_bs = block_sparse_attention(q, k, v, idx, seg, block=block, interpret=True)

    # jnp oracle: mask out non-selected blocks then dense softmax
    l = 256
    pos = np.arange(l)
    allow = np.zeros((l, l), bool)
    for i in range(nq):
        for j in idx[0, i]:
            if j >= 0:
                allow[i * block:(i + 1) * block, int(j) * block:(int(j) + 1) * block] = True
    allow &= pos[:, None] >= pos[None, :]
    segn = np.asarray(seg[0])
    allow &= (segn[:, None] == segn[None, :]) & (segn[:, None] != 0)

    from xtuner_tpu.ops.attention.reference import repeat_kv
    scale = q.shape[-1] ** -0.5
    kf = repeat_kv(k, 2)
    vf = repeat_kv(v, 2)
    logits = jnp.einsum("blhd,bshd->bhls", q, kf) * scale
    logits = jnp.where(jnp.asarray(allow)[None, None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    oracle = jnp.einsum("bhls,bshd->blhd", p, vf)
    rowv = np.asarray(allow).any(1)
    np.testing.assert_allclose(np.asarray(out_bs)[0][rowv], np.asarray(oracle)[0][rowv],
                               rtol=3e-5, atol=3e-5)


def test_grad_parity_all_blocks():
    q, k, v, seg = make_inputs(b=1, l=128, seed=2)
    block = 64
    idx = all_blocks_idx(1, 128, block)

    def loss_bs(q, k, v):
        return jnp.sum(block_sparse_attention(q, k, v, idx, seg, block=block,
                                              interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, seg) ** 2)

    g_bs = jax.grad(loss_bs, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_bs, "qkv"):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_select_key_blocks():
    rng = np.random.default_rng(3)
    l, block = 256, 64
    scores = jnp.asarray(rng.standard_normal((1, l, l)), jnp.float32)
    pos = np.arange(l)
    scores = jnp.where(jnp.asarray(pos[:, None] >= pos[None, :])[None], scores, -jnp.inf)
    idx = select_key_blocks(scores, block, num_sel=2)
    assert idx.shape == (1, 4, 2)
    idx_np = np.asarray(idx)
    for i in range(4):
        sel = idx_np[0, i][idx_np[0, i] >= 0]
        assert (sel <= i).all()  # causal at block level
        assert (np.diff(sel) > 0).all()  # ascending unique
    # first q-block can only see itself
    assert list(idx_np[0, 0]) == [-1, 0]


def test_indexer_block_stats_matches_dense_pooling():
    """Chunked indexer stats (no (B,L,L) materialization — the 64k DSA
    enabler) == dense indexer_scores + pooling, values AND gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xtuner_tpu.ops.attention.block_sparse import (select_from_blockmax,
                                                       select_key_blocks)
    from xtuner_tpu.ops.sparse_mla import indexer_block_stats, indexer_scores

    b, l, hi, di, block = 2, 64, 2, 8, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, l, hi, di)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hi, di)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, l, hi)), jnp.float32)
    seg = jnp.asarray(np.repeat([[1, 2]], l // 2, axis=-1).reshape(1, l).repeat(b, 0))

    pooled, blockmax = indexer_block_stats(q, k, w, seg, block)
    dense = indexer_scores(q, k, w, seg)  # (B, L, L)
    nk = l // block
    pooled_ref = jax.nn.logsumexp(dense.reshape(b, l, nk, block), axis=-1)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=1e-5, atol=1e-5)
    # selection parity with the dense select_key_blocks path
    idx_chunked = select_from_blockmax(blockmax, 3)
    idx_dense = select_key_blocks(dense, block, 3)
    np.testing.assert_array_equal(np.asarray(idx_chunked), np.asarray(idx_dense))

    # gradient parity through the pooled lse (the distillation input)
    def loss_chunked(q, k, w):
        p, _ = indexer_block_stats(q, k, w, seg, block)
        return jnp.sum(jnp.where(jnp.isfinite(p), p, 0.0))

    def loss_dense(q, k, w):
        d = indexer_scores(q, k, w, seg)
        p = jax.nn.logsumexp(d.reshape(b, l, nk, block), axis=-1)
        return jnp.sum(jnp.where(jnp.isfinite(p), p, 0.0))

    g_c = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, w)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, w)
    for a, bb in zip(g_c, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5)
