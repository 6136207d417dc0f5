"""Cross-framework Muon check: our optax Muon vs an independently-written
torch implementation of the reference algorithm (xtuner/v1/optim/muon.py:
muon_update_pre/post_orthogonalize :1364-1405, zeropower_via_newtonschulz5
:1428-1489, lr-ratio table :339-352, adamw_update :139-181).

The torch mirror below is written from the algorithm spec, NOT imported from
the reference — it exists to catch transcription errors in the JAX port
(momentum order, nesterov form, NS coefficient schedule, transpose rule,
lr-ratio formula, decoupled weight decay placement).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xtuner_tpu.optim.muon import _NS_SCHEDULE, muon_with_adamw_fallback  # noqa: E402
from xtuner_tpu.config.optim import MuonConfig  # noqa: E402

LR = 0.02
WD = 0.01
MOM = 0.95


def torch_newton_schulz5(g: torch.Tensor, eps: float = 1e-7) -> torch.Tensor:
    x = g.to(torch.bfloat16)
    transpose = x.shape[-2] > x.shape[-1]
    if transpose:
        x = x.mT
    x = x / (x.norm(dim=(-2, -1), keepdim=True) + eps)
    for a, b, c in _NS_SCHEDULE:
        xxt = x @ x.mT
        x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
    if transpose:
        x = x.mT
    return x


def torch_muon_step(x, g, m, *, nesterov=True):
    """One Muon update for a 2-D param; returns (new_x, new_m)."""
    m = MOM * m + g
    u = g + MOM * m if nesterov else m
    o = torch_newton_schulz5(u.float()).float()
    ratio = 0.2 * np.sqrt(max(x.shape[-2], x.shape[-1]))  # rms_norm mode
    x = x * (1 - LR * WD)  # decoupled wd at the BASE lr
    x = x - LR * ratio * o
    return x, m


def torch_adamw_step(x, g, m, v, step, *, b1=0.9, b2=0.999, eps=1e-8, lr=1e-5):
    """Reference adamw_update math (muon.py:139-181), no wd for 1-D params."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    bc1 = 1 - b1 ** step
    bc2 = 1 - b2 ** step
    denom = v.sqrt() / np.sqrt(bc2) + eps
    x = x - (lr / bc1) * m / denom
    return x, m, v


@pytest.fixture(scope="module")
def tx_and_params():
    cfg = MuonConfig(lr=LR, weight_decay=WD, momentum=MOM, nesterov=True,
                     adamw_lr=1e-5)
    tx = muon_with_adamw_fallback(cfg, lambda step: LR)
    rng = np.random.default_rng(0)
    params = {
        "w1": rng.normal(size=(64, 32)).astype(np.float32) * 0.1,   # muon, m>n
        "w2": rng.normal(size=(32, 48)).astype(np.float32) * 0.1,   # muon, m<n
        "stack": rng.normal(size=(3, 16, 24)).astype(np.float32) * 0.1,  # muon/vmap
        "bias": rng.normal(size=(32,)).astype(np.float32) * 0.1,    # adamw fallback
    }
    return tx, params


def test_muon_matches_torch_reference_over_5_steps(tx_and_params):
    tx, params0 = tx_and_params
    jp = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(jp)

    tp = {k: torch.tensor(v, dtype=torch.float32) for k, v in params0.items()}
    tm = {k: torch.zeros_like(v) for k, v in tp.items()}
    tv_b = torch.zeros_like(tp["bias"])

    rng = np.random.default_rng(1)
    for step in range(1, 6):
        grads_np = {k: rng.normal(size=v.shape).astype(np.float32) * 0.05
                    for k, v in params0.items()}
        jg = {k: jnp.asarray(v) for k, v in grads_np.items()}
        updates, state = tx.update(jg, state, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)

        tg = {k: torch.tensor(v) for k, v in grads_np.items()}
        for k in ("w1", "w2"):
            tp[k], tm[k] = torch_muon_step(tp[k], tg[k], tm[k])
        # stacked param: per-matrix NS (our vmap path)
        new_slices = []
        for li in range(tp["stack"].shape[0]):
            s, msl = torch_muon_step(tp["stack"][li], tg["stack"][li], tm["stack"][li])
            new_slices.append(s)
            tm["stack"][li] = msl
        tp["stack"] = torch.stack(new_slices)
        tp["bias"], tm["bias"], tv_b = torch_adamw_step(
            tp["bias"], tg["bias"], tm["bias"], tv_b, step)

    for k in params0:
        ours = np.asarray(jp[k])
        ref = tp[k].numpy()
        # bf16 NS compute in both frameworks rounds differently; updates are
        # O(lr*ratio) so compare the parameter DELTA, not raw values
        delta_ours = ours - params0[k]
        delta_ref = ref - params0[k]
        denom = np.abs(delta_ref).mean() + 1e-12
        err = np.abs(delta_ours - delta_ref).mean() / denom
        assert err < 0.05, f"{k}: mean relative update error {err:.4f}"
        # direction agreement
        cos = (delta_ours * delta_ref).sum() / (
            np.linalg.norm(delta_ours) * np.linalg.norm(delta_ref) + 1e-12)
        assert cos > 0.999, f"{k}: update direction cosine {cos:.5f}"
