"""Muon: Newton-Schulz orthogonalization property + optimizer mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.config.optim import LRConfig, MuonConfig, build_optimizer
from xtuner_tpu.optim.muon import newton_schulz


def test_newton_schulz_orthogonalizes():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    o = np.asarray(newton_schulz(g, steps=5), np.float32)
    # Muon's quintic drives singular values into a band around 1 (by design
    # not exactly orthonormal); input had sv spread ~[2, 20] after norm
    sv = np.linalg.svd(o, compute_uv=False)
    assert sv.min() > 0.3 and sv.max() < 1.4, (sv.min(), sv.max())
    # vastly tighter than the input's conditioning
    sv_in = np.linalg.svd(np.asarray(g), compute_uv=False)
    assert (sv.max() / sv.min()) < 0.5 * (sv_in.max() / sv_in.min())
    # sign/direction preserved: <o, g> > 0
    assert float((o * np.asarray(g)).sum()) > 0


def test_muon_optimizer_updates():
    cfg = MuonConfig(lr=0.01, adamw_lr=1e-3)
    tx = build_optimizer(cfg, LRConfig(lr_type="constant", warmup_steps=0), 10)
    params = {
        "layers": {"w": jnp.ones((2, 16, 32)) * 0.1},   # muon (stacked matrices)
        "embed": {"w": jnp.ones((8, 16)) * 0.1},        # adamw (embedding)
        "norm": jnp.ones((16,)),                        # adamw (1-D)
    }
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new)):
        assert not np.allclose(np.asarray(a), np.asarray(b))
    u = np.asarray(updates["layers"]["w"])
    assert np.isfinite(u).all()


def test_newton_schulz_approximates_polar_factor():
    """NS(G) must align with the exact polar factor U@Vt of G (the quantity
    Muon's update is defined by) — directional agreement, not just
    orthogonality. The quintic NS iteration trades exactness for speed, so
    the check is cosine similarity of the flattened matrices."""
    rng = np.random.default_rng(0)
    for shape in [(64, 64), (128, 32), (32, 128)]:
        g = rng.standard_normal(shape).astype(np.float32)
        o = np.asarray(newton_schulz(jnp.asarray(g), steps=5), np.float32)
        u, _, vt = np.linalg.svd(g, full_matrices=False)
        polar = u @ vt
        cos = float((o * polar).sum() / (np.linalg.norm(o) * np.linalg.norm(polar)))
        assert cos > 0.98, (shape, cos)


def test_muon_matches_manual_reference_step():
    """One Muon step == the hand-computed reference algorithm: nesterov
    momentum buffer -> NS orthogonalization -> rms_norm lr-ratio scaled
    update (reference optim/muon.py:339-352, :1364-1405)."""
    from xtuner_tpu.optim.muon import scale_by_muon

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    tx = scale_by_muon(momentum=0.9, nesterov=True, ns_steps=5)
    state = tx.init({"w": w})
    upd, _ = tx.update({"w": g}, state, {"w": w})

    # manual: buf = 0.9*0 + g; u = g + 0.9*buf (nesterov); o = NS(u) * ratio
    buf = np.asarray(g)
    u = np.asarray(g) + 0.9 * buf
    o = np.asarray(newton_schulz(jnp.asarray(u), steps=5), np.float32)
    ratio = 0.2 * np.sqrt(max(16, 8))  # rms_norm mode (reference default)
    np.testing.assert_allclose(np.asarray(upd["w"]), o * ratio, rtol=1e-5, atol=1e-5)
