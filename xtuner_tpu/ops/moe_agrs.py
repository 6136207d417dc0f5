"""Expert-parallel dispatch via all-gather + reduce-scatter (AGRS).

Reference: xtuner/v1/module/dispatcher/agrs.py (518 LoC) — instead of the
routed token all-to-all, every EP rank all-gathers the full token set,
computes the contributions of ITS local experts for every routed hit, and
reduce-scatters the partial outputs back to the token owners. Trades
bandwidth (N*H gathered instead of routed subsets) for a simpler,
latency-tolerant schedule — wins when topk is high relative to ep_size
(most tokens hit most ranks anyway) and for small EP groups.

TPU redesign: one `jax.shard_map` over the `ep` mesh axis:
`jax.lax.all_gather(tokens)` -> local-expert hit selection at static
worst-case capacity N*topk -> ragged grouped GEMMs -> weighted scatter-add
into an (N, H) partial -> `jax.lax.psum_scatter` back to the token shards.
Uses only dense collectives, so it runs on every backend (no ragged
all-to-all HLO required, unlike ops/moe_a2a.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .act_fn import get_act_fn, swiglu_clipped
from .moe import grouped_gemm


def _agrs_block(x, topk_idx, topk_weights, gate_w, up_w, down_w, *,
                num_experts: int, ep_size: int, act: str,
                fsdp_axis: str | None, ep_axis: str):
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

    # ---- phase 1: gather every token + routing decision (AG) ----
    xg = jax.lax.all_gather(x, ep_axis, axis=0, tiled=True)  # (N, H)
    idxg = jax.lax.all_gather(topk_idx, ep_axis, axis=0, tiled=True)  # (N, K)
    wg = jax.lax.all_gather(topk_weights, ep_axis, axis=0, tiled=True)  # (N, K)
    n = n_loc * ep_size

    # ---- phase 2: select hits on MY local experts, expert-sort them ----
    flat = idxg.reshape(-1)  # (N*K,)
    local = flat - my * e_loc
    hit = (local >= 0) & (local < e_loc)
    sort_key = jnp.where(hit, local, e_loc)  # non-hits to the sentinel tail
    perm = jnp.argsort(sort_key)
    token_idx = perm // k  # global token row per sorted slot
    rows = jnp.take(xg, token_idx, axis=0)  # (N*K, H)
    group_sizes = jnp.bincount(jnp.where(hit, local, e_loc), length=e_loc + 1)[:e_loc]

    # ---- phase 3: local expert GEMMs (dropless) ----
    gate = grouped_gemm(rows, gate_w, group_sizes)
    up = grouped_gemm(rows, up_w, group_sizes)
    if act == "swiglu_clipped":
        hidden = swiglu_clipped(gate, up).astype(rows.dtype)
    else:
        hidden = (get_act_fn(act)(gate) * up).astype(rows.dtype)
    out = grouped_gemm(hidden, down_w, group_sizes).astype(rows.dtype)

    # ---- phase 4: weighted scatter-add into the full-token partial ----
    hit_sorted = jnp.take(hit, perm)
    w_sorted = jnp.take(wg.reshape(-1), perm)
    weighted = jnp.where(hit_sorted[:, None],
                         out.astype(jnp.float32) * w_sorted[:, None], 0.0)
    partial = jnp.zeros((n, h), jnp.float32).at[token_idx].add(weighted)

    # ---- phase 5: reduce-scatter partials back to token owners (RS) ----
    mine = jax.lax.psum_scatter(partial, ep_axis, scatter_dimension=0, tiled=True)
    return mine.astype(x.dtype)


def moe_mlp_agrs(x2d, topk_idx, topk_weights, gate_w, up_w, down_w, *,
                 num_experts: int, act: str, mesh, rules: dict[str, Any],
                 compute_dtype):
    """shard_map wrapper. x2d: (N, H) global; expert weights (E, H, F) global.

    Token dim sharded over every data axis; the AG/RS pair rides only `ep`.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    ep_size = sizes["ep"]
    data_axes = tuple(a for a in ("dp", "fsdp", "ep", "sp") if sizes.get(a, 1) > 1)
    fsdp_axis = "fsdp" if sizes.get("fsdp", 1) > 1 else None

    tok2_spec = P(data_axes or None, None)
    w_spec = P("ep", fsdp_axis, None)
    w_spec_t = P("ep", None, fsdp_axis)  # down: (E, F, H)

    block = functools.partial(
        _agrs_block, num_experts=num_experts, ep_size=ep_size, act=act,
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
