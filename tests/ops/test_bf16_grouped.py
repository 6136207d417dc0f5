"""Parity tests for the Pallas bf16 grouped GEMM (ops/bf16_grouped.py).

Interpret-mode on CPU (conftest virtual mesh); the real-TPU compile check is
tools/bench_grouped.py BENCH_PALLAS_GROUPED=1 (see ADVICE: interpret mode
does not catch TPU tiling constraints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.bf16_grouped import (
    bf16_grouped_linear,
    grouped_gemm_bf16,
    grouped_gemm_bf16_dw,
)
from xtuner_tpu.ops.moe import grouped_gemm_reference


def _mk(m, h, i, e, seed=0, sizes=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((e, h, i)) * 0.05, jnp.bfloat16)
    if sizes is None:
        raw = rng.multinomial(m, np.ones(e) / e)
    else:
        raw = np.asarray(sizes)
        assert raw.sum() == m
    return x, w, jnp.asarray(raw, jnp.int32)


@pytest.mark.parametrize("sizes", [
    None,                                      # ragged balanced-ish
    [0, 512, 0, 1024, 0, 0, 333, 179],          # zero groups + non-aligned
    [2048, 0, 0, 0, 0, 0, 0, 0],                # all rows on one expert
])
def test_fwd_matches_reference(sizes):
    m, h, i, e = 2048, 256, 128, 8
    x, w, gs = _mk(m, h, i, e, sizes=sizes)
    got = grouped_gemm_bf16(x, w, gs, interpret=True)
    want = grouped_gemm_reference(x, w, gs)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.1)


def test_transpose_rhs_matches_reference():
    m, h, i, e = 1536, 256, 128, 4
    x, w, gs = _mk(m, h, i, e)
    g = jnp.asarray(np.random.default_rng(1).standard_normal((m, i)), jnp.bfloat16)
    got = grouped_gemm_bf16(g, w, gs, transpose_rhs=True, interpret=True)
    wt = jnp.swapaxes(w, 1, 2)  # (E, I, H)
    want = grouped_gemm_reference(g, wt, gs)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.1)


@pytest.mark.parametrize("m,h,i,e,sizes", [
    (1536, 256, 128, 4, [100, 924, 0, 512]),
    # n=1024 is NOT divisible by the default 768 block cap — exercises the
    # divisor search (block_n=512), the shape the bench's down-proj wgrad hits
    (1024, 256, 1024, 4, [256, 256, 256, 256]),
])
def test_dw_matches_loop(m, h, i, e, sizes):
    x, w, gs = _mk(m, h, i, e, sizes=sizes)
    dy = jnp.asarray(np.random.default_rng(2).standard_normal((m, i)), jnp.bfloat16)
    got = grouped_gemm_bf16_dw(x, dy, gs, e, interpret=True)
    starts = np.concatenate([[0], np.cumsum(np.asarray(gs))])
    want = np.zeros((e, h, i), np.float32)
    xs, dys = np.asarray(x, np.float32), np.asarray(dy, np.float32)
    for ei in range(e):
        sl = slice(starts[ei], starts[ei + 1])
        want[ei] = xs[sl].T @ dys[sl]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.5)


def test_linear_grads_match_ragged_dot():
    """Full custom-VJP parity vs the XLA ragged_dot path on the same loss."""
    m, h, i, e = 1111, 256, 128, 4  # non-512-multiple M exercises padding
    x, w, gs = _mk(m, h, i, e, sizes=[400, 0, 600, 111])
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    co = jnp.asarray(np.random.default_rng(3).standard_normal((m, i)), jnp.float32)

    def loss_pallas(x_, w_):
        out = bf16_grouped_linear(x_.astype(jnp.bfloat16), w_, gs, True)
        return jnp.sum(out.astype(jnp.float32) * co)

    def loss_ragged(x_, w_):
        out = jax.lax.ragged_dot(x_.astype(jnp.bfloat16), w_.astype(jnp.bfloat16),
                                 gs, preferred_element_type=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * co)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xf, wf)
    gx_r, gw_r = jax.grad(loss_ragged, argnums=(0, 1))(xf, wf)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=0.05,
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=0.05,
                               atol=0.5)


def test_moe_mlp_forward_pallas_impl():
    """moe_mlp_forward(gemm_impl='pallas') matches the ragged_dot default."""
    from xtuner_tpu.module.moe_layer import expert_mlp_param_specs, moe_mlp_forward
    from xtuner_tpu.module.params import init_params
    from xtuner_tpu.module.router import GreedyRouterConfig, router_param_specs

    b, l, hdim, e, k, f = 2, 64, 128, 8, 2, 64
    rcfg = GreedyRouterConfig()
    params = init_params(
        {"experts": expert_mlp_param_specs(hdim, f, e),
         "router": router_param_specs(rcfg, hdim, e)},
        jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (b, l, hdim), jnp.bfloat16)

    out_r, _, load_r = moe_mlp_forward(
        params["experts"], params["router"], rcfg, x, num_experts=e, top_k=k)
    out_p, _, load_p = moe_mlp_forward(
        params["experts"], params["router"], rcfg, x, num_experts=e, top_k=k,
        gemm_impl="pallas")
    np.testing.assert_array_equal(np.asarray(load_r), np.asarray(load_p))
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_r, np.float32), rtol=0.05, atol=0.2)
