"""Pallas bf16 grouped GEMM for the MoE expert path (megablox-style).

Reference intent: xtuner/v1/ops/moe/ grouped-GEMM kernels (Triton TMA
persistent grouped GEMM). The default TPU path is `jax.lax.ragged_dot`
(ops/moe.py); this kernel is the hand-scheduled alternative for shapes where
XLA's ragged lowering leaves MXU efficiency on the table (measured ~47%
whole-step on the moe_heavy bench geometry, docs/kernels.md).

Design (shares the visit-table machinery with ops/fp8_grouped.py):

- rows arrive expert-sorted (the dropless permute layout); a host-free visit
  table built in-graph from `group_sizes` maps grid steps to (m-block,
  expert) pairs, with boundary-straddling blocks visited once per expert and
  row-masked on the f32 partial — group sizes need no alignment;
- K is NOT blocked: the full contraction runs in one MXU dot per visit
  (K <= 4096 fits VMEM comfortably at block_m 512), so there is no ki loop
  and no cross-step accumulator flush except across straddle visits;
- the N dimension is blocked only when w tiles would blow VMEM; consecutive
  visits of one expert reuse the resident w block (Mosaic skips the DMA when
  the index map value repeats), so steady-state traffic is just the x rows;
- one kernel serves fwd (contract w dim K: "nn") and dgrad (contract w dim
  N: "nt" — w stays in its (E, K, N) layout, no transposed copy); wgrad is a
  separate expert-flush kernel contracting the ragged M dimension.

`bf16_grouped_linear` wires the three into a custom VJP that drops into
moe_mlp_forward behind MoEConfig.grouped_gemm_impl = "pallas".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp8_grouped import build_visit_table


def _vmem_budget() -> int:
    """VMEM planning budget in bytes (XTUNER_GG_VMEM_MB to experiment)."""
    return int(os.environ.get("XTUNER_GG_VMEM_MB", "12")) * 1024 * 1024


def _pick_block_n(n: int, k: int, block_m: int) -> int:
    """Largest N block keeping (x + w + acc + out) double-buffered under
    the VMEM budget; N is only blocked when necessary."""
    for bn in (n, 1024, 768, 512, 384, 256, 128):
        if bn > n or n % bn:
            continue
        vmem = (2 * block_m * k * 2      # x double-buffered bf16
                + 2 * k * bn * 2         # w double-buffered bf16
                + block_m * bn * 4       # f32 accumulator
                + 2 * block_m * bn * 2)  # out double-buffered
        if vmem <= _vmem_budget():
            return bn
    return 128


def _gg_kernel(xblk_ref, mblk_ref, rs_ref, re_ref, first_ref, last_ref, exp_ref,
               x_ref, w_ref, o_ref, acc_scr, *, block_m, contract_rhs_dim):
    j, t = pl.program_id(0), pl.program_id(1)
    blk_start = xblk_ref[t] * block_m
    # interior fast path: a block wholly inside one expert's row range is
    # visited exactly once — the MXU result goes straight to the output
    # buffer, skipping the f32 scratch round-trip (zero-init + masked add +
    # copy-out are 3 VPU passes over the accumulator that serialized after
    # every dot; ~97% of visits at bench group sizes are interior)
    full = (rs_ref[t] <= blk_start) & (re_ref[t] >= blk_start + block_m)
    single = (first_ref[t] == 1) & (last_ref[t] == 1) & full

    part = jax.lax.dot_general(
        x_ref[...], w_ref[0], (((1,), (contract_rhs_dim,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(single)
    def _direct():
        o_ref[...] = part.astype(o_ref.dtype)

    @pl.when(jnp.logical_not(single))
    def _accumulate():
        @pl.when(first_ref[t] == 1)
        def _init():
            acc_scr[...] = jnp.zeros_like(acc_scr)

        rows = blk_start + jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0)
        row_ok = (rows >= rs_ref[t]) & (rows < re_ref[t])
        acc_scr[...] += jnp.where(row_ok, part, 0.0)

        @pl.when(last_ref[t] == 1)
        def _done():
            o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def grouped_gemm_bf16(x, w, group_sizes, *, out_dtype=None,
                      transpose_rhs: bool = False, block_m: int = 512,
                      interpret: bool = False):
    """x (M, C) rows sorted by expert; w (E, K, N); group_sizes (E,) int32.

    transpose_rhs=False: C == K, returns (M, N) = x @ w[e]      (fwd)
    transpose_rhs=True:  C == N, returns (M, K) = x @ w[e]^T    (dgrad)

    M must be a block_m multiple (pad rows; padded rows land past the last
    group and are never accumulated thanks to the row mask).
    """
    m, c = x.shape
    e, k, n = w.shape
    out_n = k if transpose_rhs else n
    assert c == (n if transpose_rhs else k), (x.shape, w.shape, transpose_rhs)
    assert m % block_m == 0, (m, block_m)
    if out_dtype is None:
        out_dtype = x.dtype

    # One extra DUMP block row: Pallas flushes the live output buffer when
    # the out index changes AND at grid end, so trailing invalid visit slots
    # must own a block nothing reads — mapping them to block 0 would smear a
    # stale accumulator over real output at grid end.
    m_out = m + block_m
    tab = build_visit_table(group_sizes, m, block_m)
    valid = tab["valid"] == 1
    dump = m_out // block_m - 1
    tab = dict(tab,
               # x_block stays in-bounds for x (m rows); only the OUTPUT map
               # may point at the dump block
               x_block=tab["m_block"],
               m_block=jnp.where(valid, tab["m_block"], dump),
               first=jnp.where(valid, tab["first"], 1),
               last=jnp.where(valid, tab["last"], 1))
    t_cap = int(tab["m_block"].shape[0])
    block_n = _pick_block_n(out_n, c, block_m)
    # Mosaic accepts any block equal to the full dim; otherwise the lane dim
    # must be a 128-multiple divisor (pallas_grouped_ok gates "auto" on this)
    assert out_n % block_n == 0, (out_n, block_n)

    if transpose_rhs:
        # j blocks w's K rows; contract the full N dim (w dim 2)
        w_spec = pl.BlockSpec((1, block_n, n),
                              lambda j, t, xb, mb, rs, re, fi, la, ex: (ex[t], j, 0))
        contract_rhs_dim = 1  # of the (block_n, n) block -> out (bm, block_n)
    else:
        w_spec = pl.BlockSpec((1, k, block_n),
                              lambda j, t, xb, mb, rs, re, fi, la, ex: (ex[t], 0, j))
        contract_rhs_dim = 0

    kern = functools.partial(_gg_kernel, block_m=block_m,
                             contract_rhs_dim=contract_rhs_dim)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(out_n // block_n, t_cap),
            in_specs=[
                pl.BlockSpec((block_m, c),
                             lambda j, t, xb, mb, rs, re, fi, la, ex: (xb[t], 0)),
                w_spec,
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n),
                lambda j, t, xb, mb, rs, re, fi, la, ex: (mb[t], j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_out, out_n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tab["x_block"], tab["m_block"], tab["row_start"], tab["row_end"],
      tab["first"], tab["last"], tab["expert"], x, w)
    return out[:m]


def _dw_kernel(mblk_ref, rs_ref, re_ref, efirst_ref, elast_ref, exp_ref,
               x_ref, dy_ref, dw_ref, acc_scr, *, block_m):
    kb, nb, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(efirst_ref[t] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    blk_start = mblk_ref[t] * block_m
    full = (rs_ref[t] <= blk_start) & (re_ref[t] >= blk_start + block_m)

    @pl.when(full)
    def _unmasked():
        acc_scr[...] += jax.lax.dot_general(
            x_ref[...], dy_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_not(full))
    def _masked():
        rows = blk_start + jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0)
        row_ok = (rows >= rs_ref[t]) & (rows < re_ref[t])
        # rows of OTHER experts in a straddling block must not contract into
        # dw: zero them on the narrower operand before the dot (stay in the
        # operand dtype — an f32 round-trip here is two extra VPU passes)
        xv = x_ref[...]
        x = jnp.where(row_ok, xv, jnp.zeros_like(xv))
        acc_scr[...] += jax.lax.dot_general(
            x, dy_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(elast_ref[t] == 1)
    def _done():
        dw_ref[0] = acc_scr[...].astype(dw_ref.dtype)


def grouped_gemm_bf16_dw(x, dy, group_sizes, num_experts: int, *,
                         out_dtype=jnp.float32, block_m: int = 512,
                         block_k: int = 512, block_n: int = 768,
                         interpret: bool = False):
    """wgrad: dw[e] = x_e^T @ dy_e over ragged expert rows.

    x (M, K), dy (M, N) both expert-sorted, M a block_m multiple.
    -> (E, K, N) out_dtype.
    """
    m, k = x.shape
    m2, n = dy.shape
    assert m == m2 and m % block_m == 0

    def _pick(v, cap):
        for c in (cap, 768, 512, 384, 256, 128):
            if c <= min(cap, v) and v % c == 0:
                return c
        return v  # no aligned divisor: full dim (legal at any size)

    block_k = _pick(k, block_k)
    block_n = _pick(n, block_n)
    tab = build_visit_table(group_sizes, m, block_m)
    # dump expert slot E for trailing invalid visits (see grouped_gemm_bf16)
    valid = tab["valid"] == 1
    tab = dict(tab,
               expert=jnp.where(valid, tab["expert"], num_experts),
               e_first=jnp.where(valid, tab["e_first"], 1),
               e_last=jnp.where(valid, tab["e_last"], 1))
    t_cap = int(tab["m_block"].shape[0])

    kern = functools.partial(_dw_kernel, block_m=block_m)
    dw = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(k // block_k, n // block_n, t_cap),
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda kb, nb, t, mb, rs, re, ef, el, ex: (mb[t], kb)),
                pl.BlockSpec((block_m, block_n),
                             lambda kb, nb, t, mb, rs, re, ef, el, ex: (mb[t], nb)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_k, block_n),
                lambda kb, nb, t, mb, rs, re, ef, el, ex: (ex[t], kb, nb)),
            scratch_shapes=[pltpu.VMEM((block_k, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((num_experts + 1, k, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tab["m_block"], tab["row_start"], tab["row_end"],
      tab["e_first"], tab["e_last"], tab["expert"], x, dy)
    # drop the dump slot; zero-token experts have no visit (never written)
    return jnp.where((group_sizes > 0)[:, None, None], dw[:num_experts], 0.0)


def pallas_grouped_ok(hidden: int, inter: int) -> bool:
    """Shape gate for gemm_impl='auto': the visit-table kernels need
    lane-aligned GEMM dims (everything real models use: 768/1024/1536/...)."""
    return hidden % 128 == 0 and inter % 128 == 0


# ------------------------------------------------------------------ VJP op
def _interp(interpret):
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _pad_rows(x, mult: int):
    pad = (-x.shape[0]) % mult
    return (jnp.pad(x, ((0, pad), (0, 0))) if pad else x), pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bf16_grouped_linear(x, w, group_sizes, interpret=None):
    """Differentiable grouped linear over expert-sorted rows: x (M, K),
    w (E, K, N) -> (M, N) in x.dtype; all three GEMMs run through the Pallas
    visit-table kernels. Drop-in for grouped_gemm when
    MoEConfig.grouped_gemm_impl == "pallas"."""
    out, _ = _bgl_fwd(x, w, group_sizes, interpret)
    return out


def _fwd_block_m(out_n: int) -> int:
    # measured on v5e (docs/kernels.md): wide-N blocks want smaller m blocks
    # so the full N stays unblocked within the VMEM budget (108.7 vs 98.6
    # TF/s at N=1536)
    env = os.environ.get("XTUNER_GG_BLOCK_M")
    if env:
        return int(env)
    return 256 if out_n >= 1536 else 512


def _bgl_fwd(x, w, group_sizes, interpret):
    it = _interp(interpret)
    bm = _fwd_block_m(w.shape[2])
    xp, pad = _pad_rows(x, max(512, bm))
    out = grouped_gemm_bf16(xp, w.astype(x.dtype), group_sizes,
                            block_m=bm, interpret=it)
    if pad:
        out = out[: x.shape[0]]
    return out, (x, w, group_sizes)


def _bgl_bwd(interpret, res, g):
    it = _interp(interpret)
    x, w, group_sizes = res
    bm = _fwd_block_m(w.shape[1])
    pad_mult = max(512, bm)
    gp, pad = _pad_rows(g, pad_mult)
    xp, _ = _pad_rows(x, pad_mult)
    dx = grouped_gemm_bf16(gp, w.astype(g.dtype), group_sizes,
                           transpose_rhs=True, block_m=bm, interpret=it)
    if pad:
        dx = dx[: x.shape[0]]
    dw = grouped_gemm_bf16_dw(xp, gp, group_sizes, w.shape[0], interpret=it)
    return dx.astype(x.dtype), dw.astype(w.dtype), None


bf16_grouped_linear.defvjp(_bgl_fwd, _bgl_bwd)
