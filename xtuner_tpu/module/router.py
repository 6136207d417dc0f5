"""MoE routers.

Reference: xtuner/v1/module/router/ — GreedyRouter (greedy.py:47: softmax or
sigmoid scoring, top-k, norm_topk_prob, routed scaling) and NoAuxRouter
(noaux_router.py:50: DeepSeek aux-loss-free sigmoid routing with the
persistent e_score_correction_bias buffer and group-limited top-k; the bias is
updated post-step from expert load, moe.py:296-361).
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from .params import ParamSpec


class RouterOutput(NamedTuple):
    topk_weights: jax.Array  # (N, K) fp32 combine weights
    topk_idx: jax.Array  # (N, K) int32 expert ids
    logits: jax.Array  # (N, E) fp32 raw router logits (z-loss)
    probs: jax.Array  # (N, E) fp32 full routing probabilities (balancing loss)


class GreedyRouterConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    router_type: Literal["greedy"] = "greedy"
    scoring_func: Literal["softmax", "sigmoid"] = "softmax"
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    router_bias: bool = False


class NoAuxRouterConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    router_type: Literal["noaux"] = "noaux"
    scoring_func: Literal["sigmoid"] = "sigmoid"
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    n_group: int = 1
    topk_group: int = 1
    router_bias: bool = False
    bias_update_speed: float = 0.001


RouterConfig = GreedyRouterConfig | NoAuxRouterConfig


def router_param_specs(cfg: RouterConfig, hidden_size: int, num_experts: int) -> dict:
    specs = {"w": ParamSpec((hidden_size, num_experts), (None, None), scale=0.02)}
    if cfg.router_bias:
        specs["b"] = ParamSpec((num_experts,), (None,), init="zeros")
    if cfg.router_type == "noaux":
        # persistent correction bias — NOT a gradient-trained param; updated
        # from expert load statistics post-step (reference moe.py:296-361)
        specs["e_score_correction_bias"] = ParamSpec((num_experts,), (None,), init="zeros")
    return specs


def greedy_route(p: dict, cfg: GreedyRouterConfig, x, top_k: int) -> RouterOutput:
    """x: (N, H) -> top-k routing. Router math in fp32 (parity-critical)."""
    logits = x.astype(jnp.float32) @ p["w"].astype(jnp.float32)
    if "b" in p:
        logits = logits + p["b"].astype(jnp.float32)
    if cfg.scoring_func == "softmax":
        probs = jax.nn.softmax(logits, axis=-1)
    else:
        probs = jax.nn.sigmoid(logits)
    topk_weights, topk_idx = jax.lax.top_k(probs, top_k)
    if cfg.norm_topk_prob:
        topk_weights = topk_weights / jnp.maximum(
            jnp.sum(topk_weights, axis=-1, keepdims=True), 1e-20
        )
    topk_weights = topk_weights * cfg.routed_scaling_factor
    return RouterOutput(topk_weights, topk_idx.astype(jnp.int32), logits, probs)


def noaux_route(p: dict, cfg: NoAuxRouterConfig, x, top_k: int) -> RouterOutput:
    """DeepSeek aux-free router: selection uses sigmoid scores + correction
    bias (+ group-limited top-k); combine weights use the *unbiased* scores."""
    logits = x.astype(jnp.float32) @ p["w"].astype(jnp.float32)
    if "b" in p:
        logits = logits + p["b"].astype(jnp.float32)
    scores = jax.nn.sigmoid(logits)
    bias = jax.lax.stop_gradient(p["e_score_correction_bias"].astype(jnp.float32))
    biased = scores + bias[None, :]

    n, e = biased.shape
    if cfg.n_group > 1:
        # group-limited: keep only the topk_group best groups per token
        grouped = biased.reshape(n, cfg.n_group, e // cfg.n_group)
        # group score = sum of its top-2 experts (DeepSeek V3 semantics)
        top2 = jax.lax.top_k(grouped, 2)[0].sum(axis=-1)  # (N, n_group)
        _, keep_groups = jax.lax.top_k(top2, cfg.topk_group)
        group_mask = jnp.zeros((n, cfg.n_group), biased.dtype).at[
            jnp.arange(n)[:, None], keep_groups
        ].set(1.0)
        biased = jnp.where(
            jnp.repeat(group_mask, e // cfg.n_group, axis=-1) > 0, biased, -jnp.inf
        )

    _, topk_idx = jax.lax.top_k(biased, top_k)
    topk_weights = jnp.take_along_axis(scores, topk_idx, axis=-1)
    if cfg.norm_topk_prob:
        topk_weights = topk_weights / jnp.maximum(
            jnp.sum(topk_weights, axis=-1, keepdims=True), 1e-20
        )
    topk_weights = topk_weights * cfg.routed_scaling_factor
    return RouterOutput(topk_weights, topk_idx.astype(jnp.int32), logits, scores)


def route(p: dict, cfg: RouterConfig, x, top_k: int,
          forced_idx=None) -> RouterOutput:
    """forced_idx (N, K) int32 or None: rollout-routing replay (R3). Entries
    >= 0 override the fresh top-k selection (reference greedy.py:74-79 —
    replay keeps the rollout's expert ASSIGNMENT; combine weights are
    re-gathered from the training router's probabilities, then normalized);
    entries < 0 (non-response positions) keep fresh routing."""
    out = greedy_route(p, cfg, x, top_k) if cfg.router_type == "greedy" \
        else noaux_route(p, cfg, x, top_k)
    if forced_idx is None:
        return out
    use = forced_idx >= 0
    idx = jnp.where(use, forced_idx, out.topk_idx).astype(jnp.int32)
    w = jnp.take_along_axis(out.probs, idx, axis=-1)
    if cfg.norm_topk_prob:
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
    w = w * cfg.routed_scaling_factor
    weights = jnp.where(use, w, out.topk_weights)
    return RouterOutput(weights, idx, out.logits, out.probs)


def update_noaux_bias(bias, expert_load, update_speed: float):
    """Post-step correction-bias update: push load toward uniform
    (reference moe.update_bias moe.py:296-361).

    bias / expert_load: (..., E) — per-layer stacked (L, E) supported; the
    mean is per layer (last axis)."""
    expert_load = expert_load.astype(jnp.float32)
    mean_load = jnp.mean(expert_load, axis=-1, keepdims=True)
    err = mean_load - expert_load
    return (bias.astype(jnp.float32) + update_speed * jnp.sign(err)).astype(bias.dtype)
