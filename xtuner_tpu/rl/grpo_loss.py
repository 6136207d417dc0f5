"""GRPO policy loss (token-level PPO-clip + KL penalty).

Reference: xtuner/v1/rl/loss/grpo_loss.py:23-206 (cliprange, KL via the k3
estimator, importance-sampling ratios vs rollout logprobs) on top of
BaseRLLossContext (base_loss.py). Runs inside the jitted RL train step; the
policy logprobs come from `per_token_logprobs` (chunked, logits-free).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from .rollout_is import RolloutISConfig


class GRPOLossConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    cliprange_low: float = 0.2
    cliprange_high: float = 0.2
    kl_coef: float = 0.0  # 0 disables the ref-KL term
    # estimator (reference kl_loss_type: k1 | abs | mse/k2 | low_var_kl/k3)
    kl_type: str = "k3"
    # legacy scalar truncated-IS cap on the policy ratio; None disables.
    # For the full rollout<->training mismatch correction (token/sequence/
    # geometric levels, mask mode, veto) use rollout_is instead.
    is_clip: Optional[float] = None
    # rollout importance-sampling correction (reference rl/rollout_is.py);
    # requires the caller to pass rollout_logprobs
    rollout_is: Optional["RolloutISConfig"] = None
    loss_reduction: str = "token"


def grpo_loss(logprobs, old_logprobs, advantages, mask, cfg: GRPOLossConfig,
              ref_logprobs=None, global_denom=None, rollout_logprobs=None):
    """All inputs (B, L); mask selects supervised (response) tokens.

    rollout_logprobs: inference-engine logprobs of the sampled tokens; when
    cfg.rollout_is is set, IS weights w = f(old/rollout mismatch) multiply the
    policy-gradient term and mask/veto rejection shrinks the mask (reference
    rl/rollout_is.py usage in loss; drift metrics always logged when given).

    Returns (loss scalar, metrics dict).
    """
    mask = mask.astype(jnp.float32)
    metrics = {}
    if rollout_logprobs is not None:
        from .rollout_is import compute_rollout_is, mismatch_metrics

        metrics.update(mismatch_metrics(old_logprobs, rollout_logprobs, mask))
        if cfg.rollout_is is not None:
            is_w, mask, is_mets = compute_rollout_is(
                old_logprobs, rollout_logprobs, mask, cfg.rollout_is)
            metrics.update(is_mets)
        else:
            is_w = None
    else:
        is_w = None
    denom = global_denom if global_denom is not None else jnp.maximum(jnp.sum(mask), 1.0)

    log_ratio = logprobs - old_logprobs
    ratio = jnp.exp(log_ratio)
    if cfg.is_clip is not None:
        ratio = jnp.minimum(ratio, cfg.is_clip)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - cfg.cliprange_low, 1.0 + cfg.cliprange_high)
    pg = jnp.maximum(pg1, pg2)
    if is_w is not None:
        pg = pg * jax.lax.stop_gradient(is_w)
    loss = jnp.sum(pg * mask) / denom

    metrics.update({
        "pg_loss": loss,
        "ratio_mean": jnp.sum(ratio * mask) / denom,
        "clip_frac": jnp.sum((pg2 > pg1).astype(jnp.float32) * mask) / denom,
    })
    if cfg.kl_coef > 0.0 and ref_logprobs is not None:
        kl = kl_penalty(logprobs, ref_logprobs, cfg.kl_type)
        kl_loss = jnp.sum(kl * mask) / denom
        loss = loss + cfg.kl_coef * kl_loss
        metrics["kl"] = kl_loss
    return loss, metrics


def kl_penalty(logprobs, ref_logprobs, kind: str = "k3"):
    """Per-token KL penalty estimators (reference rl/loss kl_penalty:
    k1 plain difference, abs, mse/k2 squared, k3/low_var_kl the always
    non-negative low-variance estimator)."""
    d = logprobs - ref_logprobs
    if kind == "k1" or kind == "kl":
        return d
    if kind == "abs":
        return jnp.abs(d)
    if kind in ("mse", "k2"):
        return 0.5 * d * d
    if kind in ("k3", "low_var_kl"):
        # exp(ref - pi) - (ref - pi) - 1  (always >= 0)
        return jnp.exp(-d) + d - 1.0
    raise ValueError(f"Unknown kl_type {kind!r}")


class OREALLossConfig(GRPOLossConfig):
    """OREAL: separate calibration for positive/negative-advantage tokens +
    an SFT-style term on positives (reference rl/loss/oreal_loss.py:18-140).
    """

    positive_loss_factor: float = 1.0
    pos_sft_loss_weight: float = 1.0
    pos_policy_loss_weight: float = 1.0
    negative_loss_factor: float = 1.0


def oreal_loss(logprobs, old_logprobs, advantages, mask, cfg: OREALLossConfig,
               ref_logprobs=None, global_denom=None, global_pos=None,
               global_neg=None):
    """OREAL objective: positives get SFT (-logprob) + policy terms
    normalized by the GLOBAL positive-token count; negatives get the policy
    term normalized by the global negative count (reference
    oreal_loss.py build_batches). Under gradient accumulation the
    per-microbatch losses are SUMMED by the engine, so callers must pass the
    whole-batch global_pos/global_neg counts (RLColocateTrainer._pack emits
    them); the local-count fallback is only exact for a single microbatch."""
    mask = mask.astype(jnp.float32)
    pos = mask * (advantages > 0)
    neg = mask * (advantages <= 0)
    n_pos = jnp.maximum(jnp.sum(pos) if global_pos is None else global_pos, 1.0)
    n_neg = jnp.maximum(jnp.sum(neg) if global_neg is None else global_neg, 1.0)

    log_ratio = logprobs - old_logprobs
    ratio = jnp.exp(log_ratio)
    if cfg.is_clip is not None:
        ratio = jnp.minimum(ratio, cfg.is_clip)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - cfg.cliprange_low, 1.0 + cfg.cliprange_high)
    pg = jnp.maximum(pg1, pg2)

    pos_w = cfg.positive_loss_factor / n_pos
    sft_loss = jnp.sum(-logprobs * pos) * cfg.pos_sft_loss_weight * pos_w
    pos_pg = jnp.sum(pg * pos) * cfg.pos_policy_loss_weight * pos_w
    neg_pg = jnp.sum(pg * neg) * cfg.negative_loss_factor / n_neg
    loss = sft_loss + pos_pg + neg_pg

    denom = jnp.maximum(jnp.sum(mask), 1.0)
    metrics = {
        "pg_loss": pos_pg + neg_pg,
        "sft_loss": sft_loss,
        "ratio_mean": jnp.sum(ratio * mask) / denom,
        "clip_frac": jnp.sum((pg2 > pg1).astype(jnp.float32) * mask) / denom,
    }
    if cfg.kl_coef > 0.0 and ref_logprobs is not None:
        kl = kl_penalty(logprobs, ref_logprobs, cfg.kl_type)
        kl_loss = jnp.sum(kl * mask) / denom
        loss = loss + cfg.kl_coef * kl_loss
        metrics["kl"] = kl_loss
    return loss, metrics
