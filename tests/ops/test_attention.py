"""Reference attention semantics: packed-doc masking, GQA, window, sinks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.attention.reference import make_attention_mask, reference_attention


def naive_per_doc_attention(q, k, v, segment_ids, scale=None):
    """Run each document separately with plain causal softmax — ground truth."""
    b, l, hq, d = q.shape
    hkv = k.shape[2]
    rep = hq // hkv
    k = np.repeat(k, rep, axis=2)
    v = np.repeat(v, rep, axis=2)
    scale = scale or d**-0.5
    out = np.zeros_like(q, dtype=np.float32)
    for bi in range(b):
        for seg in np.unique(segment_ids[bi]):
            if seg == 0:
                continue
            idx = np.where(segment_ids[bi] == seg)[0]
            qs, ks, vs = q[bi, idx], k[bi, idx], v[bi, idx]
            n = len(idx)
            logits = np.einsum("lhd,mhd->hlm", qs.astype(np.float32), ks.astype(np.float32)) * scale
            mask = np.tril(np.ones((n, n), bool))
            logits = np.where(mask, logits, -np.inf)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            out[bi, idx] = np.einsum("hlm,mhd->lhd", probs, vs.astype(np.float32))
    return out


def test_packed_varlen_matches_per_doc():
    rng = np.random.default_rng(0)
    b, l, hq, hkv, d = 2, 48, 4, 2, 16
    q = rng.standard_normal((b, l, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    v = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    # rows: [doc1 x20, doc2 x20, pad x8], [doc1 x48]
    seg = np.zeros((b, l), np.int32)
    seg[0, :20] = 1
    seg[0, 20:40] = 2
    seg[1, :] = 1

    out = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg))
    expected = naive_per_doc_attention(q, k, v, seg)
    valid = seg != 0
    np.testing.assert_allclose(np.asarray(out)[valid], expected[valid], rtol=2e-5, atol=2e-5)


def test_mask_blocks_cross_document():
    seg = jnp.asarray([[1, 1, 2, 2, 0]])
    mask = np.asarray(make_attention_mask(seg))[0, 0]
    assert mask[0, 0] and mask[1, 0]
    assert not mask[0, 1]  # causal
    assert not mask[2, 1]  # cross-doc
    assert not mask[4, 4]  # padding
    assert mask[3, 2]


def test_sliding_window():
    seg = jnp.ones((1, 6), jnp.int32)
    mask = np.asarray(make_attention_mask(seg, window=2))[0, 0]
    assert mask[5, 5] and mask[5, 4]
    assert not mask[5, 3]


def test_sinks_reduce_attention_mass():
    rng = np.random.default_rng(1)
    b, l, h, d = 1, 8, 2, 8
    q = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    seg = jnp.ones((b, l), jnp.int32)
    out_no_sink = reference_attention(q, k, v, seg)
    out_sink = reference_attention(q, k, v, seg, sinks=jnp.full((h,), 10.0))
    # huge sink logits absorb nearly all probability -> output magnitude shrinks
    assert np.abs(np.asarray(out_sink)).mean() < 0.1 * np.abs(np.asarray(out_no_sink)).mean()


def test_gqa_repeat_matches_explicit():
    rng = np.random.default_rng(2)
    b, l, hq, hkv, d = 1, 16, 8, 2, 8
    q = rng.standard_normal((b, l, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    v = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    seg = np.ones((b, l), np.int32)
    out = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg))
    expected = naive_per_doc_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)
