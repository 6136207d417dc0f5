"""Parity tests for the Pallas paged-attention decode kernel
(ops/attention/paged_decode.py) against a jnp gather oracle.

Runs in interpret mode on CPU. NOTE (round-2 lesson): interpret mode does
not model TPU tiling constraints — the kernel also gets a real-chip compile
check via tools/bench_decode.py and the TPU rollout parity run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.attention.paged_decode import paged_decode_attn

BS = 16  # pool block size (multiple of 16)
D = 128


def _build_pool(rng, n_layers, n_blocks, hkv, dtype):
    k1, k2 = jax.random.split(rng)
    pk = jax.random.normal(k1, (n_layers, n_blocks, BS, hkv, D), dtype)
    pv = jax.random.normal(k2, (n_layers, n_blocks, BS, hkv, D), dtype)
    return pk, pv


def _oracle(q, pool_k, pool_v, layer, table, seq_lens, scale, window=None,
            sinks=None):
    b, c, hq, d = q.shape
    kk = pool_k[layer][table]  # (B, MB, BS, Hkv, D)
    vv = pool_v[layer][table]
    b_, mb, bs, hkv, _ = kk.shape
    kk = kk.reshape(b_, mb * bs, hkv, d).astype(jnp.float32)
    vv = vv.reshape(b_, mb * bs, hkv, d).astype(jnp.float32)
    rep = hq // hkv
    kk = jnp.repeat(kk, rep, axis=2)
    vv = jnp.repeat(vv, rep, axis=2)
    logits = jnp.einsum("bchd,bshd->bhcs", q.astype(jnp.float32), kk) * scale
    slot = jnp.arange(mb * bs)[None, None, :]
    qpos = seq_lens[:, None, None] + jnp.arange(c)[None, :, None]
    valid = slot <= qpos
    if window is not None:
        valid = valid & ((qpos - slot < window) | (window <= 0))
    logits = jnp.where(valid[:, None], logits, -1e30)
    if sinks is not None:
        s = sinks.astype(jnp.float32)[None, :, None, None]
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), s)
        p = jnp.exp(logits - m)
        p = p / (jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(s - m))
    else:
        p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhcs,bshd->bchd", p, vv)
    return o


def _case(c=1, hq=4, hkv=2, window=None, sinks=False, dtype=jnp.float32,
          seed=0):
    rng = jax.random.key(seed)
    b, mb, layer = 3, 5, 1
    pk, pv = _build_pool(rng, 2, 32, hkv, dtype)
    # distinct per-seq tables into a padded pool; lens straddle block edges
    table = jnp.asarray(
        [[3, 7, 1, 9, 0], [12, 4, 30, 0, 0], [20, 21, 22, 23, 24]], jnp.int32)
    seq_lens = jnp.asarray([BS * 3 + 5, BS - 1, 0], jnp.int32)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, c, hq, D), dtype)
    snk = (jax.random.normal(jax.random.fold_in(rng, 2), (hq,), jnp.float32)
           if sinks else None)
    scale = D ** -0.5
    out = paged_decode_attn(q, pk, pv, layer, table, seq_lens, scale=scale,
                            window=window, sinks=snk, interpret=True)
    ref = _oracle(q, pk, pv, layer, table, seq_lens, scale, window=window,
                  sinks=snk)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol,
                               rtol=tol)


def test_basic_c1():
    _case()


def test_chunk_c2():
    _case(c=2)


def test_bf16_gqa8():
    _case(hq=8, hkv=1, dtype=jnp.bfloat16)


def test_window():
    _case(window=BS + 3)


def test_window_traced_zero_means_full():
    # traced 0 window must equal full attention
    rng = jax.random.key(3)
    pk, pv = _build_pool(rng, 2, 32, 2, jnp.float32)
    table = jnp.asarray([[3, 7, 1, 9, 0]], jnp.int32)
    seq_lens = jnp.asarray([40], jnp.int32)
    q = jax.random.normal(rng, (1, 1, 4, D), jnp.float32)
    out = paged_decode_attn(q, pk, pv, 0, table, seq_lens, scale=D ** -0.5,
                            window=jnp.int32(0), interpret=True)
    ref = paged_decode_attn(q, pk, pv, 0, table, seq_lens, scale=D ** -0.5,
                            window=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sinks():
    _case(sinks=True)


def test_sinks_window_c2_bf16():
    _case(c=2, window=2 * BS, sinks=True, dtype=jnp.bfloat16, seed=7)
