"""Parity: fused expert-MLP kernel vs the decomposed grouped-GEMM path.

The fused kernel must match the decomposed pipeline (gate|up grouped GEMM ->
silu -> down grouped GEMM) bit-for-bit in forward (it rounds gu through bf16
before the activation for exactly this reason) and to ragged-dot-level
tolerance in gradients (the backward decomposes into the same visit-table
kernels, so this mostly pins the residual plumbing and padding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.bf16_grouped import bf16_grouped_linear
from xtuner_tpu.ops.fused_moe_mlp import fused_moe_mlp


def _mk(m, h, f, e, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, h)), jnp.bfloat16)
    w_gu = jnp.asarray(rng.normal(size=(e, h, 2 * f)) * 0.05, jnp.bfloat16)
    w_dn = jnp.asarray(rng.normal(size=(e, f, h)) * 0.05, jnp.bfloat16)
    if skew:  # empty experts + one dominant group (straddle-heavy)
        raw = np.zeros(e, np.int64)
        raw[1] = m - (e - 3)
        raw[3 : e] = 1
        raw[1] += m - raw.sum()
    else:
        raw = rng.multinomial(m, np.ones(e) / e)
    assert raw.sum() == m
    return x, w_gu, w_dn, jnp.asarray(raw, jnp.int32)


def _decomposed(x, w_gu, w_dn, gs):
    f = w_dn.shape[1]
    gu = bf16_grouped_linear(x, w_gu, gs)
    gf = gu.astype(jnp.float32)
    hidden = (jax.nn.silu(gf[:, :f]) * gf[:, f:]).astype(x.dtype)
    return bf16_grouped_linear(hidden, w_dn, gs)


@pytest.mark.parametrize("skew", [False, True])
def test_fused_mlp_forward_matches_decomposed(skew):
    x, w_gu, w_dn, gs = _mk(m=1536, h=256, f=128, e=8, skew=skew)
    want = jax.jit(_decomposed)(x, w_gu, w_dn, gs)
    got = jax.jit(lambda a, b, c, d: fused_moe_mlp(a, b, c, d))(x, w_gu, w_dn, gs)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_fused_mlp_grads_match_decomposed():
    x, w_gu, w_dn, gs = _mk(m=1024, h=256, f=128, e=4, seed=1)
    cot = jnp.asarray(np.random.default_rng(2).normal(size=(1024, 256)),
                      jnp.float32)

    def loss_fused(x_, wg_, wd_):
        return jnp.sum(fused_moe_mlp(x_, wg_, wd_, gs).astype(jnp.float32) * cot)

    def loss_dec(x_, wg_, wd_):
        return jnp.sum(_decomposed(x_, wg_, wd_, gs).astype(jnp.float32) * cot)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, w_gu, w_dn)
    gd = jax.jit(jax.grad(loss_dec, argnums=(0, 1, 2)))(x, w_gu, w_dn)
    for a, b, name in zip(gf, gd, ("dx", "dw_gu", "dw_dn")):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.05, atol=0.05, err_msg=name)


def test_fused_mlp_unpadded_rows():
    # M not a block multiple: padding must not leak garbage rows
    x, w_gu, w_dn, gs = _mk(m=700, h=256, f=128, e=4, seed=3)
    want = jax.jit(_decomposed)(x, w_gu, w_dn, gs)
    got = jax.jit(lambda a, b, c, d: fused_moe_mlp(a, b, c, d))(x, w_gu, w_dn, gs)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    assert not np.any(np.isnan(np.asarray(got, np.float32)))
