"""MoE expert-compute ops: dropless grouped GEMM + token permutation.

Reference: xtuner/v1/ops/moe/ (Triton TMA grouped-GEMM kernels + CUDA
permute/unpermute wrappers). TPU redesign: `jax.lax.ragged_dot` IS the grouped
GEMM (XLA lowers it onto the MXU with ragged group offsets — the Megablox
path). Permutation is SCATTER-FREE in both directions (round 3): because the
expert sort is a bijection, every scatter-add XLA would otherwise emit (the
combine, and both gathers' transposes) is re-expressed as a gather plus a
k-way reduction through custom VJPs — on TPU row-gathers are markedly cheaper
than scatter-adds, and the combine's (N*K, H) f32 scatter-operand temp
(~1 GB at 64k x topk-4) disappears. Everything is dropless: no capacity
factor, group sizes are data-dependent row counts, matching the reference's
tokens_per_expert histogram design (dispatcher/torch_all2all.py:79-100).

Round 4: the 1-D int32/f32 index machinery is gone too. Profiling the 64k
bench showed ELEMENT-granularity 1-D ops are the real permute cost on TPU —
`bincount` (scatter-add, 2.3 ms/layer), the `.at[sort_idx].set(iota)` inverse
permutation (1.2 ms), and every `take(w, idx)` over a (N*K,) vector
(~1.9 ms each at 0.3-1.2 GB/s effective) — while the (N*K, H) ROW gathers run
at 200-650 GB/s. So: the combine weight rides the expert sort as a payload,
the inverse permutation is a second sort (payload trick), group sizes are a
vectorized compare-reduce histogram, and the weight gradient leaves the
combine as a dense (N, K) array so no scatter exists anywhere in the VJPs.
Row gathers use 2-D index arrays (`(N, K)` -> `(N, K, H)` in ONE gather, no
(N*K, H)->(N, K, H) relayout copy) with `mode="promise_in_bounds"` (sort
outputs are in-bounds by construction; the clamp compare+select otherwise
costs a full extra pass over the gathered rows).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


class DispatchInfo(NamedTuple):
    """Result of sorting tokens by expert (the dispatch_preprocess phase)."""

    sorted_tokens: jax.Array  # (N*K, H) tokens gathered in expert order
    sort_idx: jax.Array  # (N*K,) permutation over flattened (token, k) pairs
    token_idx: jax.Array  # (N*K,) source token of each sorted row
    group_sizes: jax.Array  # (E,) rows per expert
    sorted_weights: jax.Array  # (N*K,) combine weight per sorted row (no grad)
    inv_pos: jax.Array  # (N, K) sorted-row position of each (token, k) pair
    topk_weights: jax.Array  # (N, K) combine weights in token order (grad path)


def _rows(x, idx):
    """Row gather without the OOB clamp pass (indices are sort outputs)."""
    return x.at[idx].get(mode="promise_in_bounds")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_dup(x, token_idx, inv_pos, k: int):
    """sorted_tokens = x[token_idx] with a scatter-free transpose: each
    token appears k times in the output, so dx[t] = sum_k g[inv_pos[t, k]]
    — a gather + reduce instead of XLA's scatter-add."""
    return _rows(x, token_idx)


def _gather_dup_fwd(x, token_idx, inv_pos, k):
    return _rows(x, token_idx), (token_idx, inv_pos)


def _gather_dup_bwd(k, res, g):
    token_idx, inv_pos = res
    gk = _rows(g, inv_pos)  # (N, K, H) in one 2-D-index gather
    dx = jnp.sum(gk.astype(jnp.float32), axis=1).astype(g.dtype)
    return dx, None, None


_gather_dup.defvjp(_gather_dup_fwd, _gather_dup_bwd)


def histogram(expert_ids, num_experts: int) -> jax.Array:
    """Rows per expert WITHOUT bincount: jnp.bincount lowers to a 1-element
    scatter-add (~2.3 ms at 262k rows on v5e); a broadcast compare + reduce
    is a vectorized (E, N*K) sweep the VPU eats in ~0.1 ms."""
    flat = expert_ids.reshape(-1)
    eye = jnp.arange(num_experts, dtype=flat.dtype)
    return jnp.sum(flat[None, :] == eye[:, None], axis=1, dtype=jnp.int32)


def permute(x, topk_idx, num_experts: int, topk_weights=None) -> DispatchInfo:
    """x: (N, H); topk_idx: (N, K) int32 -> rows sorted by expert id."""
    n, k = topk_idx.shape
    flat_expert = topk_idx.reshape(-1).astype(jnp.int32)
    iota = jnp.arange(n * k, dtype=jnp.int32)
    if topk_weights is None:
        topk_weights = jnp.ones((n, k), jnp.float32)
    w_flat = jax.lax.stop_gradient(topk_weights.reshape(-1).astype(jnp.float32))
    # ONE stable sort carries the source pair AND its combine weight as
    # payloads (a take(w, sort_idx) after the fact is a 1-D element gather).
    # The weight payload is grad-stopped: the weight gradient flows back as a
    # dense (N, K) from the combine VJP instead (no scatter, no sort VJP).
    _, sort_idx, sorted_weights = jax.lax.sort(
        (flat_expert, iota, w_flat), num_keys=1, is_stable=True)
    token_idx = sort_idx // k
    # inverse permutation via a SECOND sort (payload trick): sorting
    # (sort_idx, iota) by sort_idx leaves iota holding each flat pair's
    # sorted-row position — the .at[sort_idx].set(iota) scatter-set this
    # replaces ran at ~1 GB/s
    _, inv_flat = jax.lax.sort((sort_idx, iota), num_keys=1, is_stable=False)
    inv_pos = inv_flat.reshape(n, k)
    group_sizes = histogram(flat_expert, num_experts)
    # name the dispatch index machinery so remat policies can SAVE it: the
    # two 131k-row stable sorts are the most recompute-expensive non-matmul
    # ops in the layer, while the index arrays are ~2 MB/layer (int32/f32
    # vectors) — see _remat_policy("save_attn_residuals_idx")
    sort_idx = checkpoint_name(sort_idx, "moe_sort_idx")
    token_idx = checkpoint_name(token_idx, "moe_token_idx")
    sorted_weights = checkpoint_name(sorted_weights, "moe_sorted_w")
    inv_pos = checkpoint_name(inv_pos, "moe_inv_pos")
    group_sizes = checkpoint_name(group_sizes, "moe_group_sizes")
    sorted_tokens = _gather_dup(x, token_idx, inv_pos, k)
    return DispatchInfo(sorted_tokens, sort_idx, token_idx, group_sizes,
                        sorted_weights, inv_pos, topk_weights)


@jax.custom_vjp
def _combine(expert_out, topk_weights, sorted_weights, token_idx, inv_pos):
    """out[t] = sum_k tw[t, k] * eo[inv_pos[t, k]] — the weighted combine as
    ONE 2-D-index gather + fused f32 reduce (no (N, H) scatter-add, no
    (N*K, H) f32 temp, and the weights come straight from the router's
    (N, K) array — no per-row weight gather). Backward is also gather-only:
    d_eo[m] = sw[m] * g[token_idx[m]] (sw = sort-payload weights),
    d_tw[t, k] = <eo[inv_pos[t,k]], g[t]> gathered back to (N, K)."""
    out, _ = _combine_fwd(expert_out, topk_weights, sorted_weights, token_idx,
                          inv_pos)
    return out


def _combine_fwd(expert_out, topk_weights, sorted_weights, token_idx, inv_pos):
    eo_g = _rows(expert_out, inv_pos)  # (N, K, H), one gather, no relayout
    out = jnp.sum(eo_g.astype(jnp.float32)
                  * topk_weights[..., None].astype(jnp.float32), axis=1)
    return out, (expert_out, topk_weights, sorted_weights, token_idx, inv_pos)


def _combine_bwd(res, g):
    expert_out, topk_weights, sorted_weights, token_idx, inv_pos = res
    tw_dtype = topk_weights.dtype
    g_rows = _rows(g, token_idx)  # (N*K, H) f32
    d_eo = (g_rows * sorted_weights[:, None].astype(jnp.float32)).astype(
        expert_out.dtype)
    d_w_sorted = jnp.sum(g_rows * expert_out.astype(jnp.float32), axis=-1)
    # back to token order as (N, K): the one unavoidable 1-D gather (4 B/row);
    # the alternative — a second (N, K, H) row gather of eo — moves 512 MB
    d_tw = _rows(d_w_sorted, inv_pos).astype(tw_dtype)
    return d_eo, d_tw, None, None, None


_combine.defvjp(_combine_fwd, _combine_bwd)


def unpermute(expert_out, info: DispatchInfo, num_tokens: int):
    """Weighted combine back to token order: (N*K, H) -> (N, H) f32."""
    return _combine(expert_out, info.topk_weights, info.sorted_weights,
                    info.token_idx, info.inv_pos)


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
