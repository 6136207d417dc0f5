"""Pallas flash varlen attention vs the eager reference (interpret mode on CPU).

Parity contract (reference test strategy: CPU protocol impls as oracle,
SURVEY.md §4.4): forward and grads must match the fp32 eager implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.ops.attention.flash import flash_attention
from xtuner_tpu.ops.attention.reference import reference_attention


def make_inputs(b=2, l=256, hq=4, hkv=2, d=32, seed=0, docs=3):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, l, hq, d), dtype=np.float32)
    k = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    v = rng.standard_normal((b, l, hkv, d), dtype=np.float32)
    seg = np.zeros((b, l), np.int32)
    for bi in range(b):
        # random doc boundaries + trailing padding
        cuts = np.sort(rng.choice(np.arange(16, l - 16), docs - 1, replace=False))
        bounds = [0, *cuts.tolist(), l - rng.integers(0, 16)]
        for si in range(len(bounds) - 1):
            seg[bi, bounds[si]:bounds[si + 1]] = si + 1
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg))


@pytest.mark.parametrize("block", [64, 128])
def test_forward_parity(block):
    q, k, v, seg = make_inputs()
    out_ref = reference_attention(q, k, v, seg)
    out_flash = flash_attention(q, k, v, seg, block_q=block, block_k=block, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=2e-5, atol=2e-5
    )
    # padding rows must be exactly zero
    np.testing.assert_array_equal(np.asarray(out_flash)[~valid], 0.0)


def test_forward_parity_window():
    q, k, v, seg = make_inputs(seed=1)
    out_ref = reference_attention(q, k, v, seg, window=64)
    out_flash = flash_attention(q, k, v, seg, window=64, block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=2e-5, atol=2e-5
    )


def test_forward_parity_sinks():
    q, k, v, seg = make_inputs(seed=2, hq=4, hkv=4)
    sinks = jnp.asarray(np.random.default_rng(3).standard_normal(4), jnp.float32)
    out_ref = reference_attention(q, k, v, seg, sinks=sinks)
    out_flash = flash_attention(q, k, v, seg, sinks=sinks, block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=3e-5, atol=3e-5
    )


def test_grad_parity():
    q, k, v, seg = make_inputs(b=1, l=128, seed=4)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, seg) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, block_q=64, block_k=64, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_grad_parity_sinks():
    q, k, v, seg = make_inputs(b=1, l=128, hq=4, hkv=4, seed=5)
    sinks = jnp.asarray(np.random.default_rng(6).standard_normal(4), jnp.float32)

    def loss_ref(q, k, v, s):
        return jnp.sum(reference_attention(q, k, v, seg, sinks=s) ** 2)

    def loss_flash(q, k, v, s):
        return jnp.sum(flash_attention(q, k, v, seg, sinks=s, block_q=64, block_k=64,
                                       interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    for a, b_, name in zip(g_ref, g_flash, ["q", "k", "v", "sinks"]):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("bound", [10.0, 1000.0])  # max-free path / cond fallback
def test_forward_parity_max_logit(bound):
    q, k, v, seg = make_inputs(seed=8)
    out_ref = reference_attention(q, k, v, seg)
    out_flash = flash_attention(q, k, v, seg, max_logit=jnp.float32(bound),
                                block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(out_flash)[~valid], 0.0)


def test_grad_parity_max_logit():
    q, k, v, seg = make_inputs(b=1, l=128, seed=9)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, seg) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, max_logit=jnp.float32(12.0),
                                       block_q=64, block_k=64, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_forward_parity_max_logit_sinks_window():
    q, k, v, seg = make_inputs(seed=10, hq=4, hkv=4)
    sinks = jnp.asarray(np.random.default_rng(11).standard_normal(4), jnp.float32)
    out_ref = reference_attention(q, k, v, seg, sinks=sinks, window=64)
    out_flash = flash_attention(q, k, v, seg, sinks=sinks, window=64,
                                max_logit=jnp.float32(15.0),
                                block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=3e-5, atol=3e-5
    )


def test_non_divisible_length_padding():
    q, k, v, seg = make_inputs(b=1, l=200, seed=7)
    out_ref = reference_attention(q, k, v, seg)
    out_flash = flash_attention(q, k, v, seg, block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("bwd", ["grouped", "two_pass"])
def test_grad_parity_multi_block_accumulation(monkeypatch, bwd):
    """Regression: dq/dk/dv accumulation across >2 revisited blocks. The
    round-4 fused backward accumulated dq in HBM via input_output_aliases
    across non-consecutive grid steps — Pallas gives each grid step the
    ORIGINAL aliased buffer (no read-your-writes), so every q row attending
    more than one k block silently dropped all but the last contribution.
    l=256 with 64-blocks gives rows with 1..4 contributing k blocks."""
    from xtuner_tpu.ops.attention import flash as flash_mod
    monkeypatch.setattr(flash_mod, "ATTN_BWD", bwd)
    q, k, v, seg = make_inputs(b=1, l=256, seed=12)
    vmask = (seg != 0).astype(q.dtype)[..., None, None]

    def loss_ref(q, k, v):
        return jnp.sum((reference_attention(q, k, v, seg) * vmask) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum((flash_mod.flash_attention(
            q, k, v, seg, block_q=64, block_k=64, interpret=True) * vmask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4,
                                   atol=2e-4, err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("ratio", [2, 4])
@pytest.mark.parametrize("bound", [10.0, 1000.0])  # max-free / running-max kernels
def test_oversized_fwd_k_tile(monkeypatch, ratio, bound):
    """Pin the forward-only oversized k tile (block_k_fwd = ratio * block_q,
    sub_k = block_q): both the max-free sub-chain loop and the sub-blocked
    online-softmax fallback must stay exact across doc boundaries, and grads
    route through the square-block backward unchanged."""
    monkeypatch.setenv("XTUNER_FLASH_BLOCK_K", str(64 * ratio))
    q, k, v, seg = make_inputs(b=1, l=256, seed=12)
    out_ref = reference_attention(q, k, v, seg)
    out_flash = flash_attention(q, k, v, seg, max_logit=jnp.float32(bound),
                                block_q=64, block_k=64, interpret=True)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(out_flash)[valid], np.asarray(out_ref)[valid], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(out_flash)[~valid], 0.0)

    # mask padding rows out of the loss: the kernel zeroes seg==0 rows (and
    # their grads) by contract, the eager oracle does not
    vmask = (seg != 0).astype(q.dtype)[..., None, None]

    def loss_ref(q, k, v):
        return jnp.sum((reference_attention(q, k, v, seg) * vmask) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum((flash_attention(q, k, v, seg, max_logit=jnp.float32(bound),
                                        block_q=64, block_k=64, interpret=True)
                        * vmask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")
