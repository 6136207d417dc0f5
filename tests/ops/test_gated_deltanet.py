"""Gated delta rule: chunked WY form vs exact sequential scan oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.gated_deltanet import gated_delta_rule_chunked, gated_delta_rule_scan


def make_inputs(b=2, l=128, h=2, dk=16, dv=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, l, h, dk)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, dk)) * 0.5, jnp.float32)
    # normalize keys (the module l2-normalizes; keeps the delta rule stable)
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    v = jnp.asarray(rng.standard_normal((b, l, h, dv)) * 0.5, jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.8, 1.0, (b, l, h)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.1, 0.9, (b, l, h)), jnp.float32)
    return q, k, v, alpha, beta


@pytest.mark.parametrize("chunk", [16, 64])
def test_chunked_matches_scan(chunk):
    q, k, v, alpha, beta = make_inputs()
    o_scan = gated_delta_rule_scan(q, k, v, alpha, beta)
    o_chunk = gated_delta_rule_chunked(q, k, v, alpha, beta, chunk=chunk)
    np.testing.assert_allclose(np.asarray(o_chunk), np.asarray(o_scan), rtol=2e-4, atol=2e-4)


def test_chunked_matches_scan_with_doc_resets():
    q, k, v, alpha, beta = make_inputs(b=1, l=96, seed=1)
    seg = np.ones((1, 96), np.int32)
    seg[0, 40:80] = 2
    seg[0, 80:] = 3
    seg = jnp.asarray(seg)
    o_scan = gated_delta_rule_scan(q, k, v, alpha, beta, segment_ids=seg)
    o_chunk = gated_delta_rule_chunked(q, k, v, alpha, beta, segment_ids=seg, chunk=32)
    np.testing.assert_allclose(np.asarray(o_chunk), np.asarray(o_scan), rtol=2e-4, atol=2e-4)
    # state actually resets: output at a doc start must not depend on doc 1
    q2, k2, v2, a2, b2 = make_inputs(b=1, l=96, seed=2)
    o_mixed = gated_delta_rule_scan(q, k, v, alpha, beta, segment_ids=seg)
    o_repl = gated_delta_rule_scan(
        jnp.concatenate([q2[:, :40], q[:, 40:]], 1).astype(q.dtype) * 0 + jnp.concatenate([q2[:, :40], q[:, 40:]], 1),
        jnp.concatenate([k2[:, :40], k[:, 40:]], 1),
        jnp.concatenate([v2[:, :40], v[:, 40:]], 1),
        jnp.concatenate([a2[:, :40], alpha[:, 40:]], 1),
        jnp.concatenate([b2[:, :40], beta[:, 40:]], 1), segment_ids=seg)
    np.testing.assert_allclose(np.asarray(o_mixed[:, 40:]), np.asarray(o_repl[:, 40:]),
                               rtol=1e-5, atol=1e-5)


def test_grads_flow_chunked():
    q, k, v, alpha, beta = make_inputs(b=1, l=64)

    def f(q, k, v):
        return jnp.sum(gated_delta_rule_chunked(q, k, v, alpha, beta, chunk=16) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).sum()) > 0


def test_non_divisible_length():
    q, k, v, alpha, beta = make_inputs(b=1, l=50)
    o_scan = gated_delta_rule_scan(q, k, v, alpha, beta)
    o_chunk = gated_delta_rule_chunked(q, k, v, alpha, beta, chunk=16)
    np.testing.assert_allclose(np.asarray(o_chunk), np.asarray(o_scan), rtol=2e-4, atol=2e-4)
