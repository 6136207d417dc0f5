"""Muon optimizer (momentum + Newton-Schulz orthogonalization).

Reference: xtuner/v1/optim/muon.py (245-912) — a heavily distributed
implementation: batched NS over DTensor shards, async gather/compute overlap,
FSDP-mesh-aware expert subgroups, and a Triton NS kernel. Under GSPMD all of
that collapses: parameters are global arrays, the NS iteration is five jnp
matmuls XLA maps onto the MXU, and sharding propagation handles distribution.

Matrix params (ndim>=2, excluding embeddings/lm_head) get Muon; everything
else falls back to AdamW — same split as the reference (muon.py:139-244).
Layer-stacked params (L, m, n) are orthogonalized per-layer via vmap.
"""

from __future__ import annotations

from math import sqrt
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

# Per-iteration quintic NS coefficient schedule (the tuned public Muon
# constants; reference zeropower_via_newtonschulz5, muon.py:1428-1489, uses
# this same 5-tuple schedule instead of a fixed coefficient triple)
_NS_SCHEDULE = (
    (4.0848, -6.8946, 2.9270),
    (3.9505, -6.3029, 2.6377),
    (3.7418, -5.5913, 2.3037),
    (2.8769, -3.1427, 1.2046),
    (2.8366, -3.0525, 1.2012),
)
# fixed quintic coefficients used when ns_steps != 5
_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz(g: jax.Array, steps: int = 5, eps: float = 1e-7) -> jax.Array:
    """Orthogonalize the last two dims of g (bf16 compute, fp32 in/out).
    steps=5 runs the tuned per-iteration schedule; other step counts fall
    back to the fixed quintic coefficients."""
    transpose = g.shape[-2] > g.shape[-1]
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    x = x / (jnp.linalg.norm(x, axis=(-2, -1), keepdims=True) + eps)

    coeffs = _NS_SCHEDULE if steps == len(_NS_SCHEDULE) else (_NS_COEFFS,) * steps
    for a, b, c in coeffs:  # static unroll: tiny loop, per-step constants
        xxt = x @ jnp.swapaxes(x, -1, -2)
        x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(g.dtype)


class MuonState(NamedTuple):
    momentum: optax.Updates


def _lr_ratio(shape, adjust_lr: str) -> float:
    """Per-param lr adjustment (reference muon.py:339-352): "rms_norm"
    (default, Adam-lr compatible) = 0.2*sqrt(max(m, n)); "spectral_norm"
    (lr transfer across scale) = sqrt(m/n); "none" = 1. For stacked
    (L/E, m, n) params the per-matrix dims are the last two."""
    m, n = shape[-2], shape[-1]
    if adjust_lr == "rms_norm":
        return 0.2 * sqrt(max(m, n))
    if adjust_lr == "spectral_norm":
        return sqrt(m / n)
    return 1.0


def scale_by_muon(momentum: float = 0.95, nesterov: bool = True, ns_steps: int = 5,
                  adjust_lr: str = "rms_norm"):
    def init_fn(params):
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        buf = jax.tree.map(lambda m, g: momentum * m + g, state.momentum, updates)
        eff = jax.tree.map(lambda m, g: g + momentum * m, buf, updates) if nesterov else buf

        def orth(u):
            if u.ndim == 2:
                o = newton_schulz(u.astype(jnp.float32), ns_steps)
            else:  # (L, m, n) layer-stacked (or (E, m, n) experts)
                o = jax.vmap(lambda x: newton_schulz(x, ns_steps))(u.astype(jnp.float32))
            return (o * _lr_ratio(u.shape, adjust_lr)).astype(u.dtype)

        out = jax.tree.map(orth, eff)
        return out, MuonState(momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)


def _param_labels(params) -> dict:
    def label(path, p):
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if any(k in ("embed", "lm_head") for k in keys):
            return "adamw"
        return "muon" if p.ndim >= 2 else "adamw"

    return jax.tree_util.tree_map_with_path(label, params)


def muon_with_adamw_fallback(cfg, schedule) -> optax.GradientTransformation:
    """cfg: config.optim.MuonConfig."""
    muon = optax.chain(
        scale_by_muon(cfg.momentum, cfg.nesterov, cfg.ns_steps, cfg.adjust_lr),
        optax.add_decayed_weights(cfg.weight_decay, mask=lambda p: jax.tree.map(lambda x: x.ndim >= 2, p)),
        optax.scale_by_learning_rate(schedule),
    )
    lr_ratio = cfg.adamw_lr / cfg.lr if cfg.lr else 1.0
    adamw = optax.adamw(
        learning_rate=lambda step: schedule(step) * lr_ratio,
        b1=cfg.adamw_betas[0], b2=cfg.adamw_betas[1], eps=cfg.adamw_eps,
        weight_decay=cfg.weight_decay,
        mask=lambda p: jax.tree.map(lambda x: x.ndim >= 2, p),
    )
    return optax.multi_transform({"muon": muon, "adamw": adamw}, _param_labels)
