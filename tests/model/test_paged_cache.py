"""Paged KV cache: allocator refcounts, write/gather round-trip, paged
attention parity vs dense, and GRPO-style prompt-prefix sharing."""

import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.module.kv_cache import (PagedKVCache, paged_attention, paged_gather,
                                        paged_write, paged_write_prefill)


def test_allocator_refcounts_and_exhaustion():
    c = PagedKVCache(1, num_blocks=8, block_size=4, num_kv_heads=1, head_dim=4)
    c.add_sequence(0, 10)  # 3 blocks
    assert c.allocator.free_blocks == 5
    c.share_prefix(0, 1)   # shares the 2 aligned blocks (8 tokens)
    assert c.allocator.free_blocks == 5  # no new blocks
    assert c.seq_lens[1] == 8
    c.release(0)
    # shared blocks still referenced by seq 1
    assert c.allocator.free_blocks == 6
    c.release(1)
    assert c.allocator.free_blocks == 8
    c.add_sequence(2, 32)
    with pytest.raises(MemoryError):
        c.add_sequence(3, 4)


def test_write_gather_roundtrip():
    rng = np.random.default_rng(0)
    c = PagedKVCache(2, num_blocks=16, block_size=4, num_kv_heads=2, head_dim=8,
                     dtype=jnp.float32)
    c.add_sequence(0, 6)
    c.add_sequence(1, 9)
    table = jnp.asarray(c.block_table([0, 1]))
    k0 = rng.standard_normal((2, 6, 2, 8)).astype(np.float32)
    # prefill writes 6 tokens for both rows (row 1 gets 3 more singly)
    pool = paged_write_prefill(c.pool_k, 0, table, jnp.asarray(k0))
    extra = rng.standard_normal((3, 2, 8)).astype(np.float32)
    for j in range(3):
        # row 0 rewrites its last slot with the same value (stays static);
        # row 1 appends decode tokens 6..8
        pool = paged_write(pool, 0, table, jnp.asarray([5, 6 + j]),
                           jnp.asarray(np.stack([k0[0, 5], extra[j]])))
    g = np.asarray(paged_gather(pool, 0, table))
    np.testing.assert_allclose(g[1, :6], k0[1], rtol=1e-6)
    np.testing.assert_allclose(g[1, 6:9], extra, rtol=1e-6)
    np.testing.assert_allclose(g[0, :6], k0[0], rtol=1e-6)


def test_paged_attention_matches_dense():
    rng = np.random.default_rng(1)
    b, hq, hkv, d, bs = 3, 4, 2, 8, 4
    lens = [5, 9, 12]
    c = PagedKVCache(1, num_blocks=32, block_size=bs, num_kv_heads=hkv, head_dim=d,
                     dtype=jnp.float32)
    ks, vs = [], []
    for i, n in enumerate(lens):
        c.add_sequence(i, n)
        ks.append(rng.standard_normal((n, hkv, d)).astype(np.float32))
        vs.append(rng.standard_normal((n, hkv, d)).astype(np.float32))
    table = jnp.asarray(c.block_table(list(range(b))))
    pk, pv = c.pool_k, c.pool_v
    for i, n in enumerate(lens):
        pk = paged_write_prefill(pk, 0, table[i:i + 1], jnp.asarray(ks[i][None]))
        pv = paged_write_prefill(pv, 0, table[i:i + 1], jnp.asarray(vs[i][None]))
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    out = np.asarray(paged_attention(jnp.asarray(q), pk, pv, 0, table,
                                     jnp.asarray(lens)))
    # dense oracle
    for i, n in enumerate(lens):
        k = np.repeat(ks[i], hq // hkv, axis=1)
        v = np.repeat(vs[i], hq // hkv, axis=1)
        for h in range(hq):
            lg = k[:, h] @ q[i, h] * (d ** -0.5)
            p = np.exp(lg - lg.max())
            p /= p.sum()
            np.testing.assert_allclose(out[i, h], p @ v[:, h], rtol=2e-5, atol=2e-5)


def test_prefix_sharing_is_by_reference():
    """G rollouts share one prompt's aligned blocks: pool rows are identical
    indices, and appends to a follower go to NEW blocks only."""
    c = PagedKVCache(1, num_blocks=16, block_size=4, num_kv_heads=1, head_dim=4,
                     dtype=jnp.float32)
    c.add_sequence(0, 8)  # exactly 2 aligned blocks
    for g in range(1, 4):
        c.share_prefix(0, g)
    # 4 sequences, still only 2 blocks used
    assert c.allocator.free_blocks == 14
    t0 = c.block_table([0])[0]
    for g in range(1, 4):
        assert c.block_table([g])[0, :2].tolist() == t0[:2].tolist()
    # extending a follower allocates fresh blocks, not the shared ones
    c.extend(1, 4)
    new_blocks = set(c.tables[1]) - set(c.tables[0])
    assert len(new_blocks) == 1
    assert c.allocator.free_blocks == 13
