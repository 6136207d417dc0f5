"""Expert-parallel dropless dispatch via ragged all-to-all.

Reference: the EP dispatchers (xtuner/v1/module/dispatcher/torch_all2all.py —
permute -> a2a counts -> a2a tokens -> second permute -> grouped gemm ->
reverse; and the DeepEP/NVSHMEM fused path, ops/comm/deepep_op.py). TPU
rebuild: the same 6-phase pipeline inside `jax.shard_map` with
`jax.lax.ragged_all_to_all` riding ICI over the `ep` mesh axis; expert
weights are ep-sharded on the expert dim and fsdp-sharded on the hidden dim
(all-gathered over fsdp at use, exactly FSDP semantics).

Memory: dropless has no capacity factor, so the receive buffer is sized at
the worst case n_local * topk * ep_size rows (DeepEP sizes its NVSHMEM
buffers the same way).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .act_fn import get_act_fn, swiglu_clipped
from .moe import grouped_gemm


def _exclusive_cumsum(x, axis=0):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def _ragged_supported() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _exchange(operand, out_len: int, input_offsets, send_sizes,
              output_offsets, recv_offsets, recv_sizes, ep_axis: str,
              ep_size: int, cap: int):
    """ragged_all_to_all, or a padded dense all_to_all emulation on backends
    without the ragged HLO (XLA:CPU) — same contract: for each peer d, rows
    [input_offsets[d]:+send_sizes[d]] of `operand` land contiguously in the
    output at recv_offsets-by-source order."""
    h = operand.shape[-1]
    if _ragged_supported():
        buf = jnp.zeros((out_len, h), operand.dtype)
        return jax.lax.ragged_all_to_all(
            operand, buf, input_offsets, send_sizes, output_offsets, recv_sizes,
            axis_name=ep_axis,
        )
    # padded emulation: fixed cap rows per peer
    row = jnp.arange(cap)
    gather_idx = input_offsets[:, None] + row[None, :]  # (ep, cap)
    valid_send = row[None, :] < send_sizes[:, None]
    send = jnp.take(operand, jnp.clip(gather_idx, 0, operand.shape[0] - 1), axis=0)
    send = jnp.where(valid_send[..., None], send, 0)
    recv = jax.lax.all_to_all(send, ep_axis, split_axis=0, concat_axis=0, tiled=False)
    scatter_idx = recv_offsets[:, None] + row[None, :]
    valid_recv = row[None, :] < recv_sizes[:, None]
    scatter_idx = jnp.where(valid_recv, scatter_idx, out_len)  # drop padding
    out = jnp.zeros((out_len + 1, h), operand.dtype)
    out = out.at[scatter_idx.reshape(-1)].add(
        jnp.where(valid_recv[..., None], recv, 0).reshape(-1, h))
    return out[:out_len]


def _ep_block(x, topk_idx, topk_weights, gate_w, up_w, down_w, *,
              num_experts: int, ep_size: int, act: str, fsdp_axis: str | None,
              ep_axis: str):
    """Per-device block. x: (n_loc, H); topk_*: (n_loc, K);
    gate/up/down: (E/ep, H or H/fsdp, F)."""
    n_loc, h = x.shape
    k = topk_idx.shape[1]
    e_loc = num_experts // ep_size
    my = jax.lax.axis_index(ep_axis)

    if fsdp_axis is not None:
        gate_w = jax.lax.all_gather(gate_w, fsdp_axis, axis=1, tiled=True)
        up_w = jax.lax.all_gather(up_w, fsdp_axis, axis=1, tiled=True)
        down_w = jax.lax.all_gather(down_w, fsdp_axis, axis=2, tiled=True)

    # ---- phase 1: local permute (dispatch_preprocess) ----
    flat_expert = topk_idx.reshape(-1)
    sort_idx = jnp.argsort(flat_expert)
    token_idx = sort_idx // k
    sorted_tokens = jnp.take(x, token_idx, axis=0)  # (n_loc*K, H)
    counts = jnp.bincount(flat_expert, length=num_experts)  # (E,)

    # ---- phase 2: exchange counts + token a2a ----
    send_sizes = counts.reshape(ep_size, e_loc).sum(-1)  # rows to each dest
    input_offsets = _exclusive_cumsum(send_sizes)
    # (src, dst) send matrix: my row is send_sizes
    send_matrix = jax.lax.all_gather(send_sizes, ep_axis)  # (ep, ep)[src, dst]
    recv_sizes = send_matrix[:, my]  # rows I receive from each source
    # where my chunk starts inside each destination's buffer
    output_offsets = _exclusive_cumsum(send_matrix, axis=0)[my]  # (ep,)
    # per-local-expert counts from each source (for the second permute)
    counts_matrix = jax.lax.all_to_all(
        counts.reshape(ep_size, e_loc), ep_axis, split_axis=0, concat_axis=0, tiled=False
    )  # (ep, e_loc): source s -> my experts
    capacity = n_loc * k * ep_size
    src_starts = _exclusive_cumsum(recv_sizes)  # offsets of source chunks in my buffer
    recv = _exchange(sorted_tokens, capacity, input_offsets, send_sizes,
                     output_offsets, src_starts, recv_sizes, ep_axis, ep_size,
                     cap=n_loc * k)

    # ---- phase 3: second permute -> expert-contiguous rows ----
    # received layout: per-source chunks, each ordered by my local experts.
    # build a (capacity,) expert-id vector: for row r in source chunk s, the
    # expert is determined by counts_matrix[s]; padding rows get id e_loc.
    row = jnp.arange(capacity)
    src_id = jnp.clip(jnp.searchsorted(jnp.cumsum(recv_sizes), row, side="right"),
                      0, ep_size - 1)
    within = row - src_starts[src_id]
    # expert boundaries within each source chunk
    exp_cum = jnp.cumsum(counts_matrix, axis=1)  # (ep, e_loc)
    exp_id = jnp.sum(within[:, None] >= exp_cum[src_id], axis=1)  # (capacity,)
    total_recv = recv_sizes.sum()
    exp_id = jnp.where(row < total_recv, exp_id, e_loc)  # pad sentinel
    perm = jnp.argsort(exp_id)
    gathered = jnp.take(recv, perm, axis=0)
    group_sizes = counts_matrix.sum(0)  # (e_loc,)

    # ---- phase 4: local expert GEMMs (dropless) ----
    gate = grouped_gemm(gathered, gate_w, group_sizes)
    up = grouped_gemm(gathered, up_w, group_sizes)
    if act == "swiglu_clipped":
        hidden = swiglu_clipped(gate, up).astype(gathered.dtype)
    else:
        hidden = (get_act_fn(act)(gate) * up).astype(gathered.dtype)
    out = grouped_gemm(hidden, down_w, group_sizes).astype(gathered.dtype)

    # ---- phase 5: inverse permute + reverse a2a (combine) ----
    inv_perm = jnp.argsort(perm)
    out = jnp.take(out, inv_perm, axis=0)
    # my chunk must land where dest d originally SENT from: d's forward
    # input_offsets indexed at me
    rev_output_offsets = _exclusive_cumsum(send_matrix, axis=1)[:, my]
    combined_rows = _exchange(out, n_loc * k, src_starts, recv_sizes,
                              rev_output_offsets, input_offsets, send_sizes,
                              ep_axis, ep_size, cap=n_loc * k)

    # ---- phase 6: weighted unpermute (combine_postprocess) ----
    w_sorted = jnp.take(topk_weights.reshape(-1), sort_idx, axis=0)
    weighted = combined_rows.astype(jnp.float32) * w_sorted[:, None]
    result = jnp.zeros((n_loc, h), jnp.float32).at[token_idx].add(weighted)
    return result.astype(x.dtype)


def moe_mlp_a2a(x2d, topk_idx, topk_weights, gate_w, up_w, down_w, *,
                num_experts: int, act: str, mesh, rules: dict[str, Any],
                compute_dtype):
    """shard_map wrapper. x2d: (N, H) global; expert weights (E, H, F) global.

    Token dim is sharded over every data axis; the a2a rides only `ep`.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    ep_size = sizes["ep"]
    data_axes = tuple(a for a in ("dp", "fsdp", "ep", "sp") if sizes.get(a, 1) > 1)
    fsdp_axis = "fsdp" if sizes.get("fsdp", 1) > 1 else None

    tok_spec = P(data_axes or None)
    tok2_spec = P(data_axes or None, None)
    w_spec = P("ep", fsdp_axis, None)
    w_spec_t = P("ep", None, fsdp_axis)  # down: (E, F, H)

    block = functools.partial(
        _ep_block, num_experts=num_experts, ep_size=ep_size, act=act,
        fsdp_axis=fsdp_axis, ep_axis="ep",
    )
    wrapped = jax.shard_map(
        block, mesh=mesh,
        in_specs=(tok2_spec, tok2_spec, tok2_spec, w_spec, w_spec, w_spec_t),
        out_specs=tok2_spec,
        check_vma=False,
    )
    return wrapped(x2d.astype(compute_dtype), topk_idx, topk_weights.astype(compute_dtype),
                   gate_w.astype(compute_dtype), up_w.astype(compute_dtype),
                   down_w.astype(compute_dtype))
