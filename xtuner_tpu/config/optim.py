"""Optimizer + LR schedule configs.

Reference: xtuner/v1/config/optim.py (AdamWConfig :30, LRConfig :209) and the
scheduler assembly in trainer.py:1182-1222. Implemented over optax; the
reference's SwapAdamW (CPU-offloaded states) is unnecessary on TPU — optimizer
state lives sharded in HBM like everything else. Muon is in optim/muon.py.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import optax
from pydantic import BaseModel, ConfigDict


class AdamWConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    type: Literal["adamw"] = "adamw"
    lr: float = 1e-5
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    # skip the optimizer step if grad norm exceeds this (reference
    # train_engine.py:277-292 NaN/threshold step skipping); None = only NaN skip
    skip_grad_norm_threshold: Optional[float] = None


class MuonConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    type: Literal["muon"] = "muon"
    lr: float = 0.02
    momentum: float = 0.95
    nesterov: bool = True
    ns_steps: int = 5
    # lr adjustment per matrix shape (reference muon.py:262-264, :339-352)
    adjust_lr: Literal["rms_norm", "spectral_norm", "none"] = "rms_norm"
    adamw_lr: float = 1e-5  # fallback for 1-D / embedding params
    adamw_betas: tuple[float, float] = (0.9, 0.999)
    adamw_eps: float = 1e-8
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    skip_grad_norm_threshold: Optional[float] = None


OptimConfig = AdamWConfig | MuonConfig


class LRConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    lr_type: Literal["cosine", "linear", "constant"] = "cosine"
    warmup_ratio: float = 0.03
    warmup_steps: Optional[int] = None  # overrides ratio if set
    lr_min: float = 1e-6


def build_lr_schedule(optim_cfg: OptimConfig, lr_cfg: LRConfig, total_steps: int):
    warmup = lr_cfg.warmup_steps if lr_cfg.warmup_steps is not None else int(
        lr_cfg.warmup_ratio * total_steps
    )
    peak = optim_cfg.lr
    if lr_cfg.lr_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak, warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1), end_value=lr_cfg.lr_min,
        )
    if lr_cfg.lr_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak, max(warmup, 1)),
                optax.linear_schedule(peak, lr_cfg.lr_min, max(total_steps - warmup, 1)),
            ],
            [warmup],
        )
    if lr_cfg.lr_type == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, max(warmup, 1)), optax.constant_schedule(peak)],
            [warmup],
        )
    raise ValueError(f"Unknown lr_type {lr_cfg.lr_type}")


def _decay_mask(params):
    """Apply weight decay only to >=2-D params (norm scales / biases excluded)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def build_optimizer(optim_cfg: OptimConfig, lr_cfg: LRConfig, total_steps: int,
                    param_specs=None) -> optax.GradientTransformation:
    schedule = build_lr_schedule(optim_cfg, lr_cfg, total_steps)
    if optim_cfg.type == "adamw":
        return optax.adamw(
            learning_rate=schedule,
            b1=optim_cfg.betas[0],
            b2=optim_cfg.betas[1],
            eps=optim_cfg.eps,
            weight_decay=optim_cfg.weight_decay,
            mask=_decay_mask,
        )
    if optim_cfg.type == "muon":
        from ..optim.muon import muon_with_adamw_fallback

        return muon_with_adamw_fallback(optim_cfg, schedule)
    raise ValueError(f"Unknown optimizer {optim_cfg.type}")
