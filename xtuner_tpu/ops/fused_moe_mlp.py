"""Fused MoE expert MLP: gate|up GEMM -> activation -> down GEMM in ONE
Pallas kernel sweep over the expert-sorted rows.

Reference intent: xtuner/v1/module/grouped_linear + ops/moe fused expert
pipeline (Triton grouped GEMMs with the activation between two kernel
launches). TPU redesign: the decomposed path (ops/bf16_grouped.py) costs
three HBM round-trips per layer — write gu (M, 2F), read it back for the
activation, write hidden (M, F), read it for the down GEMM — and each
grouped kernel pays the per-grid-step fixed cost separately. This kernel
keeps the whole expert MLP for one m-block resident in VMEM: per visit it
runs BOTH MXU dots plus the VPU activation (~3x compute per grid step, so
the per-step fixed cost is amortized 3x), reading only the x rows and
writing only (out, gu) — gu is emitted because the backward's activation
gradient needs it (the decomposed path materializes it anyway as the first
GEMM's output, so this is not extra traffic).

Output compositing is ROW-DISJOINT RMW, not accumulation: every sorted row
belongs to exactly ONE expert, and all visits of an m-block are consecutive
in the visit table, so Pallas keeps the output buffer live between them
(the canonical revisit pattern). A straddling visit writes its own rows and
re-selects the buffer's previous contents elsewhere; rows no visit owns
(the padded tail + the dump block) are garbage the caller slices off.

Backward decomposes into the existing visit-table kernels (grouped dgrad x2,
grouped wgrad x2) — identical GEMM passes to the unfused path; only the
forward (which remat re-runs once more in the backward) is fused.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bf16_grouped import (
    _interp,
    _pad_rows,
    grouped_gemm_bf16,
    grouped_gemm_bf16_dw,
)
from .fp8_grouped import build_visit_table


def _mlp_kernel(xblk_ref, mblk_ref, rs_ref, re_ref, exp_ref,
                x_ref, wgu_ref, wdn_ref, o_ref, gu_ref, *, block_m, f):
    t = pl.program_id(0)
    blk_start = xblk_ref[t] * block_m
    full = (rs_ref[t] <= blk_start) & (re_ref[t] >= blk_start + block_m)

    gu = jax.lax.dot_general(
        x_ref[...], wgu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # round gu through the residual dtype BEFORE the activation so forward
    # activations match the decomposed path (and the backward, which re-reads
    # the saved bf16 gu) bit-for-bit
    gu_b = gu.astype(gu_ref.dtype)
    gf = gu_b.astype(jnp.float32)
    gate, up = gf[:, :f], gf[:, f:]
    hidden = (jax.nn.silu(gate) * up).astype(x_ref.dtype)
    part = jax.lax.dot_general(
        hidden, wdn_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(full)
    def _direct():
        o_ref[...] = part.astype(o_ref.dtype)
        gu_ref[...] = gu_b

    @pl.when(jnp.logical_not(full))
    def _straddle():
        rows = blk_start + jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0)
        row_ok = (rows >= rs_ref[t]) & (rows < re_ref[t])
        o_ref[...] = jnp.where(row_ok, part.astype(o_ref.dtype), o_ref[...])
        gu_ref[...] = jnp.where(row_ok, gu_b, gu_ref[...])


def fused_mlp_fwd_kernel(x, w_gu, w_dn, group_sizes, *, block_m: int = 256,
                         interpret: bool = False):
    """x (M, H) expert-sorted bf16; w_gu (E, H, 2F); w_dn (E, F, H);
    M a block_m multiple. -> (out (M, H), gu (M, 2F)) in x.dtype."""
    m, h = x.shape
    e, h2, f2 = w_gu.shape
    f = f2 // 2
    assert h2 == h and w_dn.shape == (e, f, h), (x.shape, w_gu.shape, w_dn.shape)
    assert m % block_m == 0, (m, block_m)

    m_out = m + block_m  # dump block (see ops/bf16_grouped.py)
    tab = build_visit_table(group_sizes, m, block_m)
    valid = tab["valid"] == 1
    dump = m_out // block_m - 1
    x_block = tab["m_block"]
    out_block = jnp.where(valid, tab["m_block"], dump)
    t_cap = int(tab["m_block"].shape[0])

    kern = functools.partial(_mlp_kernel, block_m=block_m, f=f)
    out, gu = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(t_cap,),
            in_specs=[
                pl.BlockSpec((block_m, h), lambda t, xb, mb, rs, re, ex: (xb[t], 0)),
                pl.BlockSpec((1, h, f2), lambda t, xb, mb, rs, re, ex: (ex[t], 0, 0)),
                pl.BlockSpec((1, f, h), lambda t, xb, mb, rs, re, ex: (ex[t], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_m, h), lambda t, xb, mb, rs, re, ex: (mb[t], 0)),
                pl.BlockSpec((block_m, f2), lambda t, xb, mb, rs, re, ex: (mb[t], 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m_out, h), x.dtype),
            jax.ShapeDtypeStruct((m_out, f2), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x_block, out_block, tab["row_start"], tab["row_end"], tab["expert"],
      x, w_gu, w_dn)
    return out[:m], gu[:m]


def _block_m() -> int:
    return int(os.environ.get("XTUNER_FUSED_MLP_BLOCK_M", "256"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_moe_mlp(x, w_gu, w_dn, group_sizes, interpret=None):
    """Differentiable fused expert MLP over expert-sorted rows.

    x (M, H); w_gu (E, H, 2F) fused gate|up; w_dn (E, F, H); -> (M, H) in
    x.dtype. silu activation (the only act the fused kernel implements —
    moe_mlp_forward falls back to the decomposed path otherwise).
    """
    out, _ = _fmlp_fwd(x, w_gu, w_dn, group_sizes, interpret)
    return out


def _fmlp_fwd(x, w_gu, w_dn, group_sizes, interpret):
    it = _interp(interpret)
    bm = _block_m()
    xp, pad = _pad_rows(x, max(512, bm))
    out, gu = fused_mlp_fwd_kernel(xp, w_gu.astype(x.dtype),
                                   w_dn.astype(x.dtype), group_sizes,
                                   block_m=bm, interpret=it)
    if pad:
        out = out[: x.shape[0]]
        gu = gu[: x.shape[0]]
    return out, (x, w_gu, w_dn, gu, group_sizes)


def _fmlp_bwd(interpret, res, g):
    it = _interp(interpret)
    x, w_gu, w_dn, gu, group_sizes = res
    f = w_dn.shape[1]
    pad_mult = max(512, _block_m())
    gp, pad = _pad_rows(g, pad_mult)
    xp, _ = _pad_rows(x, pad_mult)

    def act(gu_):
        gf = gu_.astype(jnp.float32)
        return (jax.nn.silu(gf[:, :f]) * gf[:, f:]).astype(g.dtype)

    hidden, act_vjp = jax.vjp(act, gu)
    hp, _ = _pad_rows(hidden, pad_mult)

    # down GEMM grads
    dhidden = grouped_gemm_bf16(gp, w_dn.astype(g.dtype), group_sizes,
                                transpose_rhs=True, block_m=512, interpret=it)
    dw_dn = grouped_gemm_bf16_dw(hp, gp, group_sizes, w_dn.shape[0],
                                 interpret=it)
    if pad:
        dhidden = dhidden[: x.shape[0]]
    # activation grad (elementwise, XLA-fused)
    dgu, = act_vjp(dhidden.astype(hidden.dtype))
    dgup, _ = _pad_rows(dgu, pad_mult)
    # gate|up GEMM grads
    dx = grouped_gemm_bf16(dgup, w_gu.astype(g.dtype), group_sizes,
                           transpose_rhs=True, block_m=256, interpret=it)
    dw_gu = grouped_gemm_bf16_dw(xp, dgup, group_sizes, w_gu.shape[0],
                                 interpret=it)
    if pad:
        dx = dx[: x.shape[0]]
    return dx.astype(x.dtype), dw_gu.astype(w_gu.dtype), dw_dn.astype(w_dn.dtype), None


fused_moe_mlp.defvjp(_fmlp_fwd, _fmlp_bwd)
