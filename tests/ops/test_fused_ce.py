"""Fused CE statistics kernel vs the jnp oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.ops.fused_ce import ce_lse_and_label


def make(c=64, h=32, v=256, seed=0):
    rng = np.random.default_rng(seed)
    hid = jnp.asarray(rng.standard_normal((c, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, v)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, c), jnp.int32)
    return hid, w, labels


def test_forward_parity():
    hid, w, labels = make()
    lse, lab = ce_lse_and_label(hid, w, labels, True)
    logits = hid @ w
    np.testing.assert_allclose(np.asarray(lse), np.asarray(jax.nn.logsumexp(logits, -1)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lab),
        np.asarray(jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]),
        rtol=2e-5, atol=2e-5)


def test_grad_parity_ce_loss():
    hid, w, labels = make(seed=1)
    weights = jnp.asarray(np.random.default_rng(2).random(hid.shape[0]), jnp.float32)

    def loss_fused(hid, w):
        lse, lab = ce_lse_and_label(hid, w, labels, True)
        return jnp.sum((lse - lab) * weights)

    def loss_ref(hid, w):
        logits = hid @ w
        ce = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
            logits, labels[:, None], 1)[:, 0]
        return jnp.sum(ce * weights)

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1))(hid, w)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(hid, w)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b, name in zip(g_r, g_f, ["dh", "dw"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
                                   err_msg=name)


def test_grad_parity_logprob_direction():
    """label_logit cotangent alone (the per_token_logprobs use)."""
    hid, w, labels = make(seed=3)

    def lp_fused(hid, w):
        lse, lab = ce_lse_and_label(hid, w, labels, True)
        return jnp.sum(lab - lse)

    def lp_ref(hid, w):
        logits = hid @ w
        return jnp.sum(jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]
                       - jax.nn.logsumexp(logits, -1))

    g_f = jax.grad(lp_fused, argnums=(0, 1))(hid, w)
    g_r = jax.grad(lp_ref, argnums=(0, 1))(hid, w)
    for a, b in zip(g_r, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_ce_loss_fused_matches_chunk():
    """ce_loss(mode='fused') == mode='chunk' (value and grads), incl. ignored
    labels, on an 8-device mesh with fsdp-sharded head weight."""
    from xtuner_tpu.loss.ce_loss import CELossConfig, ce_loss
    from xtuner_tpu.parallel import MeshConfig, build_mesh
    from xtuner_tpu.parallel.sharding import ShardCtx

    rng = np.random.default_rng(4)
    b, l, h, v = 2, 64, 128, 384
    hidden = jnp.asarray(rng.standard_normal((b, l, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, v)) * 0.05, jnp.float32)
    labels = np.asarray(rng.integers(0, v, (b, l)), np.int32)
    labels[:, :5] = -100
    labels = jnp.asarray(labels)
    weights = jnp.asarray((np.asarray(labels) != -100).astype(np.float32))
    denom = jnp.sum(weights)

    mesh_cfg = MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32")
    mesh = build_mesh(mesh_cfg)
    sc = ShardCtx(mesh, mesh_cfg.rules())

    results = {}
    for mode in ("chunk", "fused"):
        cfg = CELossConfig(mode=mode, chunk_size=32)

        def f(hidden, w, cfg=cfg):
            loss, sum_ce, n = ce_loss(hidden, w, labels, weights, denom, cfg, sc=sc)
            return loss, (sum_ce, n)

        (loss, (sum_ce, n)), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                        has_aux=True)(hidden, w)
        results[mode] = (float(loss), float(sum_ce), float(n), grads)

    assert abs(results["fused"][0] - results["chunk"][0]) < 2e-5
    assert abs(results["fused"][1] - results["chunk"][1]) < 1e-2
    assert results["fused"][2] == results["chunk"][2]
    for gf, gc, name in zip(results["fused"][3], results["chunk"][3], ["dh", "dw"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gc), rtol=3e-4, atol=3e-4,
                                   err_msg=name)


def test_per_token_logprobs_fused_matches_chunk():
    from xtuner_tpu.loss.ce_loss import per_token_logprobs

    rng = np.random.default_rng(5)
    b, l, h, v = 2, 32, 128, 300
    hid = jnp.asarray(rng.standard_normal((b, l, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, v)) * 0.05, jnp.float32)
    labels = np.asarray(rng.integers(0, v, (b, l)), np.int32)
    labels[:, :3] = -100
    labels = jnp.asarray(labels)
    lp_c = per_token_logprobs(hid, w, labels, chunk_size=16)
    lp_f = per_token_logprobs(hid, w, labels, mode="fused")
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_c), rtol=2e-5, atol=2e-5)
    assert (np.asarray(lp_f)[:, :3] == 0).all()


def test_split_tail_path_parity():
    """Vocab > one tile but not tile-aligned: kernel prefix + XLA tail merge
    (the grid-prefix path, no pad/slice copy of w)."""
    from xtuner_tpu.ops.fused_ce import PAD_MULT, ce_stats_vh

    c, h, v = 64, 32, PAD_MULT + 384
    rng = np.random.default_rng(7)
    hid = jnp.asarray(rng.standard_normal((c, h)), jnp.float32)
    w_vh = jnp.asarray(rng.standard_normal((v, h)) * 0.1, jnp.float32)
    # labels straddling the split point, including tail labels
    labels = jnp.asarray(rng.integers(0, v, c).astype(np.int32))
    labels = labels.at[:8].set(jnp.arange(PAD_MULT - 4, PAD_MULT + 4))
    weights = jnp.asarray(rng.random(c), jnp.float32)

    def loss_fused(hid, w_vh):
        lse, lab = ce_stats_vh(hid, w_vh, labels, True)
        return jnp.sum((lse - lab) * weights)

    def loss_ref(hid, w_vh):
        logits = hid @ w_vh.T
        ce = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
            logits, labels[:, None], 1)[:, 0]
        return jnp.sum(ce * weights)

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1))(hid, w_vh)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(hid, w_vh)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b, name in zip(g_r, g_f, ["dh", "dw"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
                                   err_msg=name)
