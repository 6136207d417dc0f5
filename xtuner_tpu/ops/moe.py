"""MoE expert-compute ops: dropless grouped GEMM + token permutation.

Reference: xtuner/v1/ops/moe/ (Triton TMA grouped-GEMM kernels + CUDA
permute/unpermute wrappers). TPU redesign: `jax.lax.ragged_dot` IS the grouped
GEMM (XLA lowers it onto the MXU with ragged group offsets — the Megablox
path), and permutation is an argsort-gather; the scatter-add combine is the
exact unpermute. Everything is dropless: no capacity factor, group sizes are
data-dependent row counts, matching the reference's tokens_per_expert
histogram design (dispatcher/torch_all2all.py:79-100).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DispatchInfo(NamedTuple):
    """Result of sorting tokens by expert (the dispatch_preprocess phase)."""

    sorted_tokens: jax.Array  # (N*K, H) tokens gathered in expert order
    sort_idx: jax.Array  # (N*K,) permutation over flattened (token, k) pairs
    token_idx: jax.Array  # (N*K,) source token of each sorted row
    group_sizes: jax.Array  # (E,) rows per expert
    sorted_weights: jax.Array  # (N*K,) combine weight per sorted row


def permute(x, topk_idx, num_experts: int, topk_weights=None) -> DispatchInfo:
    """x: (N, H); topk_idx: (N, K) int32 -> rows sorted by expert id."""
    n, k = topk_idx.shape
    flat_expert = topk_idx.reshape(-1)
    sort_idx = jnp.argsort(flat_expert)  # stable
    token_idx = sort_idx // k
    sorted_tokens = jnp.take(x, token_idx, axis=0)
    group_sizes = jnp.bincount(flat_expert, length=num_experts)
    if topk_weights is None:
        sorted_weights = jnp.ones((n * k,), jnp.float32)
    else:
        sorted_weights = jnp.take(topk_weights.reshape(-1), sort_idx, axis=0)
    return DispatchInfo(sorted_tokens, sort_idx, token_idx, group_sizes, sorted_weights)


def unpermute(expert_out, info: DispatchInfo, num_tokens: int):
    """Weighted scatter-add back to token order: (N*K, H) -> (N, H).

    The (N*K, H) weighted rows are stored in the expert-output dtype (bf16) —
    at 64k x topk rows an f32 copy is GBs of HBM — while the top-k combine
    itself still accumulates in f32 (the converts fuse into the scatter)."""
    weighted = (expert_out.astype(jnp.float32)
                * info.sorted_weights[:, None]).astype(expert_out.dtype)
    out = jnp.zeros((num_tokens, expert_out.shape[-1]), jnp.float32)
    return out.at[info.token_idx].add(weighted.astype(jnp.float32))


def grouped_gemm(x, w, group_sizes, preferred_dtype=jnp.float32):
    """x: (M, K) rows grouped by expert; w: (E, K, N); -> (M, N).

    The TPU megablox/grouped-GEMM slot (reference ops/moe/__init__.py get_group_gemm).
    """
    return jax.lax.ragged_dot(
        x, w, group_sizes,
        preferred_element_type=preferred_dtype,
    )


def grouped_gemm_reference(x, w, group_sizes):
    """Pure-jnp oracle for tests: loop experts with masked matmul."""
    e = w.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, group_sizes.dtype), jnp.cumsum(group_sizes)])[:-1]
    m = x.shape[0]
    row = jnp.arange(m)
    out = jnp.zeros((m, w.shape[-1]), jnp.float32)
    for ei in range(e):
        mask = (row >= starts[ei]) & (row < starts[ei] + group_sizes[ei])
        contrib = (x * mask[:, None]).astype(jnp.float32) @ w[ei].astype(jnp.float32)
        out = out + contrib * mask[:, None]
    return out
