"""MoE auxiliary losses.

Reference: xtuner/v1/loss/moe_loss.py (balancing loss w/ autograd all-reduce,
z-loss) + aux_loss.py (per-layer accumulate/finalize; AuxLossScaler grafts the
aux gradient onto hidden states to avoid a second backward). Under JAX there
is one backward anyway: the losses are accumulated through the layer scan and
added to the total loss; padding tokens are excluded via the valid mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def balancing_loss(probs, topk_idx, valid, num_experts: int, top_k: int):
    """Switch-style load-balancing loss for one layer.

    probs: (N, E) routing probabilities; topk_idx: (N, K); valid: (N,) bool.
    loss = E * sum_e f_e * P_e, f_e = dispatch fraction, P_e = mean prob.
    """
    valid_f = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    one_hot = jax.nn.one_hot(topk_idx, num_experts, dtype=jnp.float32)  # (N, K, E)
    counts = jnp.einsum("nke,n->e", one_hot, valid_f)
    f = counts * num_experts / (n_valid * top_k)  # discrete dispatch fractions (no grad)
    p = jnp.einsum("ne,n->e", probs, valid_f) / n_valid  # differentiable mean probs
    return jnp.sum(f * p), counts  # (loss, per-expert load)


def z_loss(logits, valid):
    """Router z-loss: mean squared logsumexp over valid tokens."""
    valid_f = valid.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    return jnp.sum(jnp.square(lse) * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)
