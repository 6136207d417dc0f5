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


class GRPOLossConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    cliprange_low: float = 0.2
    cliprange_high: float = 0.2
    kl_coef: float = 0.0  # 0 disables the ref-KL term
    # truncated importance-sampling cap for off-policy drift
    # (reference rl/rollout_is.py); None disables
    is_clip: Optional[float] = None
    loss_reduction: str = "token"


def grpo_loss(logprobs, old_logprobs, advantages, mask, cfg: GRPOLossConfig,
              ref_logprobs=None, global_denom=None):
    """All inputs (B, L); mask selects supervised (response) tokens.

    Returns (loss scalar, metrics dict).
    """
    mask = mask.astype(jnp.float32)
    denom = global_denom if global_denom is not None else jnp.maximum(jnp.sum(mask), 1.0)

    log_ratio = logprobs - old_logprobs
    ratio = jnp.exp(log_ratio)
    if cfg.is_clip is not None:
        ratio = jnp.minimum(ratio, cfg.is_clip)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - cfg.cliprange_low, 1.0 + cfg.cliprange_high)
    pg = jnp.maximum(pg1, pg2)
    loss = jnp.sum(pg * mask) / denom

    metrics = {
        "pg_loss": loss,
        "ratio_mean": jnp.sum(ratio * mask) / denom,
        "clip_frac": jnp.sum((pg2 > pg1).astype(jnp.float32) * mask) / denom,
    }
    if cfg.kl_coef > 0.0 and ref_logprobs is not None:
        # k3 estimator: exp(ref - pi) - (ref - pi) - 1  (always >= 0)
        d = ref_logprobs - logprobs
        kl = jnp.exp(d) - d - 1.0
        kl_loss = jnp.sum(kl * mask) / denom
        loss = loss + cfg.kl_coef * kl_loss
        metrics["kl"] = kl_loss
    return loss, metrics
