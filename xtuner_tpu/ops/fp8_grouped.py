"""Pallas tile-wise fp8 GROUPED GEMM (the MoE expert path).

Reference: xtuner/v1/float8/float8_gmm_tile_wise.py:42-215
(TileWiseFloat8GroupedLinear): activations quantized per 1x128 K-tile,
expert weights per 128x128 block, all three GEMMs (fwd, dgrad, wgrad) run in
fp8 with per-tile rescaled fp32 accumulation, group sizes ragged
(tokens_per_expert).

TPU redesign (megablox-style): rows arrive SORTED by expert (the dropless
permute layout, ops/moe.py). A host-free VISIT TABLE maps grid steps to
(m-block, expert) pairs — a block straddling a group boundary is visited
once per expert with row masking, so group sizes need no block alignment.
The table is built in-graph from `group_sizes` (static upper bound
M/block_m + E visits) and rides scalar prefetch, so the index maps issue
expert-weight DMAs directly. Output flushes accumulate across same-block
visits in VMEM scratch (consecutive by construction).

The wgrad kernel reuses the same visit list with the EXPERT as flush
boundary (an expert's visits are consecutive too), contracting the ragged M
dimension per expert; its operands are re-quantized along M-tiles, matching
the reference's trans_per_tile quantizations.

On fp8-native MXUs (v6e+/v7) the in-kernel dots lower to hardware fp8; on
v5e they upconvert in-register — numerics identical, HBM traffic halved
(see docs/kernels.md for measurements + the v6e expectation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp8_gemm import _FP8_MAX, quantize_tilewise


def quantize_blockwise_stack(w, tile: int = 128, dtype=jnp.float8_e4m3fn,
                             eps: float = 1e-12):
    """w (E, K, N) -> (q (E, K, N) fp8, scale (E, K/tile, N/tile) f32)."""
    e, k, n = w.shape
    assert k % tile == 0 and n % tile == 0, (k, n, tile)
    wt = w.astype(jnp.float32).reshape(e, k // tile, tile, n // tile, tile)
    amax = jnp.max(jnp.abs(wt), axis=(2, 4), keepdims=True)
    scale = jnp.maximum(amax, eps) / _FP8_MAX[dtype]
    q = (wt / scale).astype(dtype).reshape(e, k, n)
    return q, scale[:, :, 0, :, 0]


def build_visit_table(group_sizes, m: int, block_m: int):
    """-> dict of (T,) int32 arrays, T = m//block_m + E (static).

    For visit t: m_block[t], expert[t], plus row-range [row_start, row_end)
    of that expert (for masking), first[t] (first visit of this m-block) and
    last[t] (last valid visit of this m-block). Invalid trailing slots have
    empty row ranges and first=last=0.
    """
    e = group_sizes.shape[0]
    t_cap = m // block_m + e
    offsets = jnp.cumsum(group_sizes)
    starts = offsets - group_sizes
    nonempty = group_sizes > 0
    first_blk = starts // block_m
    last_blk = jnp.where(nonempty, jnp.maximum((offsets - 1) // block_m, first_blk),
                         first_blk - 1)
    visits = jnp.where(nonempty, last_blk - first_blk + 1, 0)
    vstart = jnp.cumsum(visits) - visits  # first visit slot of each expert
    total = jnp.sum(visits)

    v = jnp.arange(t_cap, dtype=jnp.int32)
    # expert of each visit slot: last expert with vstart <= v ('right' side
    # lands past empty experts' duplicated vstart entries automatically)
    expert = jnp.clip(jnp.searchsorted(vstart, v, side="right") - 1, 0, e - 1)
    m_block = jnp.take(first_blk, expert) + (v - jnp.take(vstart, expert))
    valid = v < total
    m_block = jnp.where(valid, m_block, 0).astype(jnp.int32)
    row_start = jnp.where(valid, jnp.take(starts, expert), m + 1).astype(jnp.int32)
    row_end = jnp.where(valid, jnp.take(offsets, expert), 0).astype(jnp.int32)

    nxt = jnp.concatenate([m_block[1:], jnp.full((1,), -1, jnp.int32)])
    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros((1,), bool)])
    prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), m_block[:-1]])
    last = (valid & (~nxt_valid | (nxt != m_block))).astype(jnp.int32)
    first = (valid & (prv != m_block)).astype(jnp.int32)
    # first visit of the leading slot is always first
    first = first.at[0].set(valid[0].astype(jnp.int32))
    # expert-flush flags for the wgrad kernel (an expert's visits are
    # consecutive): first/last visit of each EXPERT
    nxt_e = jnp.concatenate([expert[1:], jnp.full((1,), -1, jnp.int32)])
    prv_e = jnp.concatenate([jnp.full((1,), -1, jnp.int32), expert[:-1]])
    e_last = (valid & (~nxt_valid | (nxt_e != expert))).astype(jnp.int32)
    e_first = (valid & ((prv_e != expert) | (prv == -1))).astype(jnp.int32)
    e_first = e_first.at[0].set(valid[0].astype(jnp.int32))
    return {
        "m_block": m_block, "expert": jnp.where(valid, expert, 0).astype(jnp.int32),
        "row_start": row_start, "row_end": row_end,
        "first": first, "last": last,
        "e_first": e_first, "e_last": e_last,
        "valid": valid.astype(jnp.int32),
    }


# ------------------------------------------------------------------ fwd/dgrad
def _gg_kernel(mblk_ref, exp_ref, rs_ref, re_ref, first_ref, last_ref,
               x_ref, sx_ref, w_ref, sw_ref, o_ref, acc_scr,
               *, k_steps, inner, tile, block_m):
    j, t, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((ki == 0) & (first_ref[t] == 1))
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    rows = mblk_ref[t] * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, 1), 0)
    row_ok = (rows >= rs_ref[t]) & (rows < re_ref[t])  # (bm, 1)

    # operands stay fp8 INTO the dot (hardware fp8 on v6e+); rows belonging
    # to the straddling expert are masked on the f32 PARTIAL instead — each
    # boundary block is visited once per expert, so every row is written by
    # exactly one visit
    x = x_ref[...]
    w = w_ref[0]
    acc = acc_scr[...]
    for ti in range(inner):  # one scale-tile per MXU dot (static unroll)
        part = jax.lax.dot_general(
            x[:, ti * tile:(ti + 1) * tile], w[ti * tile:(ti + 1) * tile, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        row = ki * inner + ti
        scaled = part * sx_ref[row, :][:, None] * sw_ref[0, row, :][None, :]
        acc = acc + jnp.where(row_ok, scaled, 0.0)
    acc_scr[...] = acc

    @pl.when((ki == k_steps - 1) & (last_ref[t] == 1))
    def _done():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def fp8_grouped_gemm(xq, sx, wq, sw, group_sizes, *, tile: int = 128,
                     out_dtype=jnp.bfloat16, block_m: int = 256,
                     block_n: int = 128, block_k: int = 512,
                     interpret: bool = False):
    """xq (M, K) fp8 rows sorted by expert; sx (M, K/tile) f32;
    wq (E, K, N) fp8; sw (E, K/tile, N/tile) f32; group_sizes (E,) int32.
    -> (M, N) out_dtype. M must be a block_m multiple (the dropless permute
    layout is padded to the topk*tokens total, which callers align)."""
    m, k = xq.shape
    e, k2, n = wq.shape
    assert k == k2 and m % block_m == 0, (m, k, k2, block_m)
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    assert k % block_k == 0 and n % block_n == 0
    inner = block_k // tile
    k_steps = k // block_k
    tab = build_visit_table(group_sizes, m, block_m)
    t_cap = int(tab["m_block"].shape[0])

    sx_t = sx.T  # (KT, M)
    sw_rep = jnp.repeat(sw, tile, axis=2)  # (E, KT, N) lane-expanded

    grid = (n // block_n, t_cap, k_steps)
    kern = functools.partial(_gg_kernel, k_steps=k_steps, inner=inner, tile=tile,
                             block_m=block_m)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda j, t, ki, mb, ex, *_: (mb[t], ki)),
                pl.BlockSpec((k // tile, block_m),
                             lambda j, t, ki, mb, ex, *_: (0, mb[t])),
                pl.BlockSpec((1, block_k, block_n),
                             lambda j, t, ki, mb, ex, *_: (ex[t], ki, j)),
                pl.BlockSpec((1, k // tile, block_n),
                             lambda j, t, ki, mb, ex, *_: (ex[t], 0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda j, t, ki, mb, ex, *_: (mb[t], j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tab["m_block"], tab["expert"], tab["row_start"], tab["row_end"],
      tab["first"], tab["last"], xq, sx_t, wq, sw_rep)
    return out


# ------------------------------------------------------------------ wgrad
def _dw_kernel(mblk_ref, exp_ref, rs_ref, re_ref, efirst_ref, elast_ref,
               x_ref, sxm_ref, dy_ref, sym_ref, dw_ref, acc_scr,
               *, block_m, tile):
    kb, nb, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(efirst_ref[t] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    rows = mblk_ref[t] * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, 1), 0)
    row_ok = (rows >= rs_ref[t]) & (rows < re_ref[t])

    # ragged contraction over rows: rows of the straddling expert MUST be
    # zeroed pre-dot (they'd contract into dw) — upconvert-and-mask, then
    # one dot per 128-row scale tile with the scalar (sx*sy) applied to the
    # f32 partial
    x = jnp.where(row_ok, x_ref[...].astype(jnp.float32), 0.0)  # (bm, bk)
    dy = jnp.where(row_ok, dy_ref[...].astype(jnp.float32), 0.0)  # (bm, bn)
    acc = acc_scr[...]
    st = block_m // tile
    for ti in range(st):
        part = jax.lax.dot_general(
            x[ti * tile:(ti + 1) * tile, :], dy[ti * tile:(ti + 1) * tile, :],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # scale tables ride full-array VMEM-resident (M/tile, 128) blocks
        # (tiny); the scale of this 128-row tile is a dynamic scalar read
        row = mblk_ref[t] * st + ti
        acc = acc + part * (sxm_ref[row, 0] * sym_ref[row, 0])
    acc_scr[...] = acc

    @pl.when(elast_ref[t] == 1)
    def _done():
        dw_ref[0] = acc_scr[...].astype(dw_ref.dtype)


def fp8_grouped_gemm_dw(xq_m, sx_m, dyq_m, sy_m, group_sizes, num_experts: int,
                        *, tile: int = 128, out_dtype=jnp.float32,
                        block_m: int = 256, block_k: int = 512,
                        block_n: int = 128, interpret: bool = False):
    """wgrad: dw[e] = x_e^T @ dy_e over ragged expert rows.

    xq_m (M, K) fp8 with sx_m (M/tile, 1) f32 — one scale per 128-row tile
    (operands re-quantized along M; reference trans_per_tile_quant
    semantics); dyq_m/sy_m likewise. -> (E, K, N) out_dtype.
    """
    m, k = xq_m.shape
    m2, n = dyq_m.shape
    assert m == m2 and m % block_m == 0
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    mt = m // tile
    tab = build_visit_table(group_sizes, m, block_m)
    t_cap = int(tab["m_block"].shape[0])
    grid = (k // block_k, n // block_n, t_cap)
    # lane-expand the per-M-tile scales so the whole table is one legal
    # full-array VMEM block (tiny: M/128 x 128 f32)
    sx_full = jnp.broadcast_to(sx_m, (mt, 128))
    sy_full = jnp.broadcast_to(sy_m, (mt, 128))

    kern = functools.partial(_dw_kernel, block_m=block_m, tile=tile)
    dw = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda kb, nb, t, mb, ex, *_: (mb[t], kb)),
                pl.BlockSpec((mt, 128),
                             lambda kb, nb, t, mb, ex, *_: (0, 0)),
                pl.BlockSpec((block_m, block_n),
                             lambda kb, nb, t, mb, ex, *_: (mb[t], nb)),
                pl.BlockSpec((mt, 128),
                             lambda kb, nb, t, mb, ex, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_k, block_n),
                                   lambda kb, nb, t, mb, ex, *_: (ex[t], kb, nb)),
            scratch_shapes=[pltpu.VMEM((block_k, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((num_experts, k, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tab["m_block"], tab["expert"], tab["row_start"], tab["row_end"],
      tab["e_first"], tab["e_last"], xq_m, sx_m, dyq_m, sy_m)
    # experts with zero tokens have NO visit — their blocks are never
    # written; zero them (their true grad)
    return jnp.where((group_sizes > 0)[:, None, None], dw, 0.0)


def quantize_rowtile(x, tile: int = 128, dtype=jnp.float8_e4m3fn, eps: float = 1e-12):
    """x (M, K) -> (q fp8, scale (M/tile, 1) f32): one scale per 128-row
    tile — the M-tile quantization the wgrad contraction needs (reference
    trans_per_tile_quant_expand_128x semantics, without the transpose —
    our kernel contracts dim 0 directly)."""
    m, k = x.shape
    assert m % tile == 0
    xt = x.astype(jnp.float32).reshape(m // tile, tile, k)
    amax = jnp.max(jnp.abs(xt), axis=(1, 2), keepdims=True)
    scale = jnp.maximum(amax, eps) / _FP8_MAX[dtype]
    q = (xt / scale).astype(dtype).reshape(m, k)
    return q, scale[:, 0, :]


# ------------------------------------------------------------------ VJP op
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fp8_grouped_linear(x, w, group_sizes, e5m2_grads: bool = False,
                       interpret=None):
    """Differentiable tile-wise fp8 grouped linear: x (M, K) rows sorted by
    expert, w (E, K, N) high-precision master -> (M, N) bf16. All three
    GEMMs run fp8 (fwd e4m3 x e4m3; dgrad [e5m2] x e4m3; wgrad re-quantized
    along M) — the reference TileWiseFloat8GroupedLinear recipe."""
    out, _ = _fgl_fwd(x, w, group_sizes, e5m2_grads, interpret)
    return out


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _pad_rows(x, mult: int = 256):
    pad = (-x.shape[0]) % mult
    return (jnp.pad(x, ((0, pad), (0, 0))) if pad else x), pad


def _fgl_fwd(x, w, group_sizes, e5m2_grads, interpret):
    it = _interp(interpret)
    xp, pad = _pad_rows(x)
    xq, sx = quantize_tilewise(xp)
    wq, sw = quantize_blockwise_stack(w)
    out = fp8_grouped_gemm(xq, sx, wq, sw, group_sizes, interpret=it)
    if pad:
        out = out[: x.shape[0]]
    return out, (x, w, group_sizes)


def _fgl_bwd(e5m2_grads, interpret, res, g):
    it = _interp(interpret)
    x, w, group_sizes = res
    g_dtype = jnp.float8_e5m2 if e5m2_grads else jnp.float8_e4m3fn
    gp, pad = _pad_rows(g)
    xp, _ = _pad_rows(x)
    # dgrad: dy (M, N) x w^T (E, N, K)
    gq, sg = quantize_tilewise(gp, dtype=g_dtype)
    wt = jnp.swapaxes(w, 1, 2)  # (E, N, K)
    wtq, swt = quantize_blockwise_stack(wt)
    dx = fp8_grouped_gemm(gq, sg, wtq, swt, group_sizes, interpret=it)
    if pad:
        dx = dx[: x.shape[0]]
    # wgrad: per-expert x_e^T @ dy_e, operands re-quantized along M-tiles
    xq_m, sx_m = quantize_rowtile(xp)
    gq_m, sg_m = quantize_rowtile(gp, dtype=g_dtype)
    dw = fp8_grouped_gemm_dw(xq_m, sx_m, gq_m, sg_m, group_sizes, w.shape[0],
                             interpret=it)
    return dx.astype(x.dtype), dw.astype(w.dtype), None


fp8_grouped_linear.defvjp(_fgl_fwd, _fgl_bwd)
