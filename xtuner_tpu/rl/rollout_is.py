"""Rollout importance-sampling correction (truncated / masked IS).

Reference: xtuner/v1/rl/rollout_is.py (verl mismatch_helper lineage) — corrects
the distribution mismatch between the rollout policy (inference engine,
possibly stale weights / different numerics) and the training policy, with
three aggregation levels (token / sequence / geometric), truncate & mask
handling modes, a per-token veto that rejects whole sequences on catastrophic
ratios, and drift metrics.

TPU redesign: everything is jnp inside the jitted RL train step — no
packed<->padded conversion round-trip (our RL batches are one sequence per
row, so sequence aggregation is a per-row masked sum), and metrics are
returned as traced scalars that ride the engine's metric tree instead of
`.item()` host syncs per key.
"""

from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict, model_validator

# exp(+-20) caps ratios at ~4.8e8 before any threshold handling
SAFETY_BOUND = 20.0


class RolloutISConfig(BaseModel):
    """Config analog of reference RolloutImportanceSampling (rollout_is.py:49).

    threshold upper/lower bound the IS weights; lower defaults to 1/upper.
    mode="truncate" clamps weights into [lower, upper] (TIS); mode="mask"
    instead zeroes the response mask outside [mask_lower, mask_upper] (MIS /
    rejection); "both" does both. veto (lower, upper) rejects a whole
    sequence when ANY token ratio falls outside it.
    """

    model_config = ConfigDict(extra="forbid")
    level: Literal["token", "sequence", "geometric"] = "token"
    mode: Literal["truncate", "mask", "both"] = "truncate"
    threshold_upper: float = 2.0
    threshold_lower: Optional[float] = None  # None -> 1/threshold_upper
    mask_threshold_upper: Optional[float] = None  # None -> threshold_upper
    mask_threshold_lower: Optional[float] = None
    veto_threshold: Optional[Tuple[float, float]] = None  # (lower, upper)

    @model_validator(mode="after")
    def _check(self):
        lo = self.threshold_lower if self.threshold_lower is not None else 1.0 / self.threshold_upper
        if self.threshold_upper <= lo:
            raise ValueError("threshold_upper must exceed threshold_lower")
        if self.veto_threshold is not None and self.veto_threshold[0] >= self.veto_threshold[1]:
            raise ValueError("veto_threshold must be (lower, upper) with lower < upper")
        return self

    @property
    def lower(self) -> float:
        return self.threshold_lower if self.threshold_lower is not None else 1.0 / self.threshold_upper

    @property
    def mask_upper(self) -> float:
        return self.mask_threshold_upper if self.mask_threshold_upper is not None else self.threshold_upper

    @property
    def mask_lower(self) -> float:
        if self.mask_threshold_lower is not None:
            return self.mask_threshold_lower
        return self.lower


def _masked_mean(x, mask, axis=None):
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1.0)


def compute_rollout_is(old_logprobs, rollout_logprobs, mask, cfg: RolloutISConfig):
    """old_logprobs: training-policy logprobs of the rollout tokens (B, L);
    rollout_logprobs: inference-engine logprobs (B, L); mask: response mask.

    Returns (weights (B, L), modified_mask (B, L), metrics dict of scalars).
    Matches reference compute_rollout_importance_weights semantics
    (rollout_is.py:118-346): weights are safety-bounded exp(log-ratio)
    aggregates, truncate clamps weights, mask/veto reject via the mask, and
    padding positions are zeroed in the weights.
    """
    mask = mask.astype(jnp.float32)
    log_ratio = (old_logprobs - rollout_logprobs) * mask

    if cfg.level == "token":
        log_agg = log_ratio
        weights = jnp.exp(jnp.clip(log_ratio, -SAFETY_BOUND, SAFETY_BOUND))
    elif cfg.level == "sequence":
        log_sum = jnp.sum(log_ratio, axis=-1, keepdims=True)
        log_agg = jnp.broadcast_to(log_sum, mask.shape)
        weights = jnp.broadcast_to(
            jnp.exp(jnp.clip(log_sum, -SAFETY_BOUND, SAFETY_BOUND)), mask.shape)
    else:  # geometric mean over response tokens
        log_mean = _masked_mean(log_ratio, mask, axis=-1)[..., None]
        log_agg = jnp.broadcast_to(log_mean, mask.shape)
        weights = jnp.broadcast_to(
            jnp.exp(jnp.clip(log_mean, -SAFETY_BOUND, SAFETY_BOUND)), mask.shape)

    # per-token veto: any catastrophic token rejects its whole sequence
    if cfg.veto_threshold is not None:
        v_lo, v_hi = cfg.veto_threshold
        catastrophic = ((log_ratio < jnp.log(v_lo)) | (log_ratio > jnp.log(v_hi))) & (mask > 0)
        has_cat = jnp.any(catastrophic, axis=-1, keepdims=True)
        veto_mask = 1.0 - has_cat.astype(jnp.float32)
    else:
        catastrophic = jnp.zeros_like(mask, dtype=bool)
        has_cat = jnp.zeros(mask.shape[:-1] + (1,), dtype=bool)
        veto_mask = jnp.ones(mask.shape[:-1] + (1,), jnp.float32)

    metrics = _is_metrics(weights, log_agg, mask, cfg, has_cat, catastrophic)

    new_mask = mask
    if cfg.mode in ("mask", "both"):
        keep = ((weights >= cfg.mask_lower) & (weights <= cfg.mask_upper)).astype(jnp.float32)
        metrics["rollout_is_masked_fraction"] = _masked_mean(1.0 - keep, mask)
        # fraction of SEQUENCES touched by masking (reference :306-314): at
        # sequence/geometric level all tokens share one weight so any-masked
        # == first-token-masked; at token level any masked token counts
        seq_has_masked = jnp.any((keep < 0.5) & (mask > 0), axis=-1).astype(jnp.float32)
        seq_valid_f = (jnp.sum(mask, axis=-1) > 0).astype(jnp.float32)
        metrics["rollout_is_seq_masked_fraction"] = (
            jnp.sum(seq_has_masked * seq_valid_f) / jnp.maximum(jnp.sum(seq_valid_f), 1.0))
        new_mask = mask * keep
    if cfg.mode in ("truncate", "both"):
        weights = jnp.clip(weights, cfg.lower, cfg.threshold_upper)
    new_mask = new_mask * veto_mask
    weights = weights * mask
    return weights, new_mask, metrics


def _is_metrics(weights, log_agg, mask, cfg, has_cat, catastrophic):
    """Drift/diagnostic metrics (reference compute_is_metrics, :348-475)."""
    seq_valid = (jnp.sum(mask, axis=-1) > 0).astype(jnp.float32)
    n_seq = jnp.maximum(jnp.sum(seq_valid), 1.0)
    log_up = jnp.log(cfg.threshold_upper)
    log_lo = jnp.log(cfg.lower)

    m = {
        "rollout_is_veto_fraction": jnp.sum(has_cat[..., 0] * seq_valid) / n_seq,
        "rollout_is_catastrophic_token_fraction": _masked_mean(
            catastrophic.astype(jnp.float32), mask),
        "rollout_is_mean": _masked_mean(weights, mask),
        "rollout_is_ratio_fraction_high": _masked_mean(
            (log_agg > log_up).astype(jnp.float32), mask),
        "rollout_is_ratio_fraction_low": _masked_mean(
            (log_agg < log_lo).astype(jnp.float32), mask),
        "rollout_is_max": jnp.max(jnp.where(mask > 0, weights, -jnp.inf)),
        "rollout_is_min": jnp.min(jnp.where(mask > 0, weights, jnp.inf)),
    }
    # std / effective sample size on clamped weights (overflow-safe)
    w_c = jnp.clip(weights, cfg.lower, cfg.threshold_upper)
    mean_c = _masked_mean(w_c, mask)
    var = jnp.maximum(_masked_mean(w_c * w_c, mask) - mean_c * mean_c, 0.0)
    m["rollout_is_std"] = jnp.sqrt(var)
    w_n = w_c / (mean_c + 1e-8)
    m["rollout_is_eff_sample_size"] = 1.0 / jnp.maximum(_masked_mean(w_n * w_n, mask), 1e-8)
    # per-sequence mean-weight spread (reference :446-466): mean/std/max/min
    # of the per-sequence mean IS weight, plus the share of sequences whose
    # mean weight escapes the thresholds — the per-prompt drift fingerprint
    seq_mean = _masked_mean(weights, mask, axis=-1)
    sm_mean = jnp.sum(seq_mean * seq_valid) / n_seq
    m["rollout_is_seq_mean"] = sm_mean
    sm_var = jnp.maximum(
        jnp.sum(seq_mean * seq_mean * seq_valid) / n_seq - sm_mean * sm_mean, 0.0)
    m["rollout_is_seq_std"] = jnp.sqrt(sm_var)
    m["rollout_is_seq_max"] = jnp.max(jnp.where(seq_valid > 0, seq_mean, -jnp.inf))
    m["rollout_is_seq_min"] = jnp.min(jnp.where(seq_valid > 0, seq_mean, jnp.inf))
    m["rollout_is_seq_max_deviation"] = jnp.max(jnp.abs(seq_mean - 1.0) * seq_valid)
    m["rollout_is_seq_fraction_high"] = jnp.sum(
        (seq_mean > cfg.threshold_upper).astype(jnp.float32) * seq_valid) / n_seq
    m["rollout_is_seq_fraction_low"] = jnp.sum(
        (seq_mean < cfg.lower).astype(jnp.float32) * seq_valid) / n_seq
    return m


def mismatch_metrics(old_logprobs, rollout_logprobs, mask):
    """Training<->rollout policy drift metrics, computed whether or not IS
    correction is enabled (reference compute_mismatch_metrics, :478-611):
    k1/k3 KL estimates and perplexity-level drift."""
    mask = mask.astype(jnp.float32)
    d = (old_logprobs - rollout_logprobs) * mask  # log(pi_train / pi_rollout)
    k1 = _masked_mean(-d, mask)  # KL(rollout || train) k1 estimate
    k3 = _masked_mean(jnp.exp(d) - d - 1.0, mask)
    seq_valid = (jnp.sum(mask, axis=-1) > 0).astype(jnp.float32)
    n_seq = jnp.maximum(jnp.sum(seq_valid), 1.0)
    # PER-SEQUENCE perplexities, batch-averaged (reference :529-543): ppl is
    # exp of the per-sequence mean NLL, not exp of the batch-mean NLL
    mean_lp_train = _masked_mean(old_logprobs, mask, axis=-1)  # (B,)
    mean_lp_roll = _masked_mean(rollout_logprobs, mask, axis=-1)
    train_ppl = jnp.sum(jnp.exp(-mean_lp_train) * seq_valid) / n_seq
    rollout_ppl = jnp.sum(jnp.exp(-mean_lp_roll) * seq_valid) / n_seq
    # log-ppl drift per sequence: log_ppl_diff = log(train_ppl_i/rollout_ppl_i)
    # (reference :545-569) — its exp, seq-averaged, is the ppl_ratio
    log_ppl_diff = (mean_lp_roll - mean_lp_train) * seq_valid
    return {
        "mismatch_kl": k1,
        "mismatch_k3_kl": k3,
        "mismatch_abs_logprob_diff": _masked_mean(jnp.abs(d), mask),
        "mismatch_training_ppl": train_ppl,
        "mismatch_training_log_ppl": jnp.sum(-mean_lp_train * seq_valid) / n_seq,
        "mismatch_rollout_ppl": rollout_ppl,
        "mismatch_rollout_log_ppl": jnp.sum(-mean_lp_roll * seq_valid) / n_seq,
        "mismatch_log_ppl_diff": jnp.sum(log_ppl_diff) / n_seq,
        "mismatch_log_ppl_abs_diff": jnp.sum(jnp.abs(log_ppl_diff)) / n_seq,
        "mismatch_log_ppl_diff_max": jnp.max(
            jnp.where(seq_valid > 0, log_ppl_diff, -jnp.inf)),
        "mismatch_log_ppl_diff_min": jnp.min(
            jnp.where(seq_valid > 0, log_ppl_diff, jnp.inf)),
        "mismatch_ppl_ratio": jnp.sum(jnp.exp(log_ppl_diff) * seq_valid) / n_seq,
    }


def merge_rollout_is_metrics(per_batch: list[dict]) -> dict:
    """Aggregate per-micro-batch IS/mismatch metric dicts into one logging
    dict (reference merge_rollout_is_metrics, rollout_is.py:592-611, minus
    the dist.all_reduce — the single-controller trainer sees every batch).

    max-named keys take the max, min-named the min, everything else the mean
    over batches whose "valid" flag is set. Accepts python floats / numpy /
    jax scalars.
    """
    import numpy as np

    if not per_batch:
        return {}
    valids = [bool(np.asarray(m.get("valid", True))) for m in per_batch]
    keys = [k for k in per_batch[0] if k != "valid"]
    out = {}
    n = sum(valids)
    for k in keys:
        vals = [float(np.asarray(m[k])) for m, ok in zip(per_batch, valids) if ok]
        if not vals:
            out[k] = 0.0
        elif "max" in k:
            out[k] = max(vals)
        elif "min" in k:
            out[k] = min(vals)
        else:
            out[k] = sum(vals) / n
    return out
