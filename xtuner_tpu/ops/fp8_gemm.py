"""Pallas tile-wise fp8 GEMM (TPU).

Reference: xtuner/v1/float8/float8_linear_tile_wise.py:34-182 (activation
quantized per 1x128 tile, weight per 128x128 block, fp8 GEMM with per-tile
rescale in the fp32 accumulator — "AdaptiveGEMM" semantics). TPU design: one
Pallas kernel with a K-innermost grid; each K step contracts `tile`-wide fp8
slabs on the MXU and applies the combined (activation-tile x weight-block)
scale to the fp32 partial before accumulation. On fp8-native MXU generations
(v6e+) the dots lower to fp8 hardware ops; on v5e the operands are upconverted
in-register but HBM traffic is still halved (fp8 operands).

Layouts:
  x  (M, K) e4m3/e5m2, sx (M, K/tile)  fp32 — per (row, K-tile) scale
  w  (K, N) e4m3/e5m2, sw (K/tile, N/tile) fp32 — per (K-tile, N-tile) block
  y  (M, N) fp32 accumulate -> out_dtype
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E4M3_MAX = 448.0
E5M2_MAX = 57344.0

_FP8_MAX = {
    jnp.float8_e4m3fn: E4M3_MAX,
    jnp.float8_e5m2: E5M2_MAX,
}


def quantize_tilewise(x, tile: int = 128, dtype=jnp.float8_e4m3fn, eps: float = 1e-12):
    """x (..., K) -> (q (..., K) fp8, scale (..., K/tile) fp32): one scale per
    contiguous K-tile of each row (reference per_token_cast_to_fp8)."""
    *lead, k = x.shape
    assert k % tile == 0, (k, tile)
    xt = x.astype(jnp.float32).reshape(*lead, k // tile, tile)
    amax = jnp.max(jnp.abs(xt), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / _FP8_MAX[dtype]
    q = (xt / scale).astype(dtype).reshape(*lead, k)
    return q, scale[..., 0]


def quantize_blockwise(w, tile: int = 128, dtype=jnp.float8_e4m3fn, eps: float = 1e-12):
    """w (K, N) -> (q (K, N) fp8, scale (K/tile, N/tile) fp32): one scale per
    (tile x tile) block (reference per_block_cast_to_fp8)."""
    k, n = w.shape
    assert k % tile == 0 and n % tile == 0, (k, n, tile)
    wt = w.astype(jnp.float32).reshape(k // tile, tile, n // tile, tile)
    amax = jnp.max(jnp.abs(wt), axis=(1, 3), keepdims=True)
    scale = jnp.maximum(amax, eps) / _FP8_MAX[dtype]
    q = (wt / scale).astype(dtype).reshape(k, n)
    return q, scale[:, 0, :, 0]


def _gemm_kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref, acc_scr, *,
                 k_steps: int, inner: int, tile: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]  # (bm, inner*tile) fp8
    w = w_ref[...]  # (inner*tile, bn) fp8
    acc = acc_scr[...]
    for t in range(inner):  # static unroll: one scale-tile per MXU dot
        part = jax.lax.dot_general(
            x[:, t * tile:(t + 1) * tile], w[t * tile:(t + 1) * tile, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        row = ki * inner + t
        sx_col = sx_ref[row, :]  # (bm,) — activation scale per row
        sw_row = sw_ref[row, :]  # (bn,) — weight block scale, lane-expanded
        acc = acc + part * sx_col[:, None] * sw_row[None, :]
    acc_scr[...] = acc

    @pl.when(ki == k_steps - 1)
    def _done():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def fp8_gemm_tilewise(xq, sx, wq, sw, *, tile: int = 128, out_dtype=jnp.bfloat16,
                      block_m: int = 256, block_n: int = 256, block_k: int = 512,
                      interpret: bool = False):
    """(M, K) fp8 x (K, N) fp8 -> (M, N) out_dtype with per-tile rescaled fp32
    accumulation. Pads M/N/K-tiles to block multiples (XLA fuses the pads).

    Scale layouts inside the kernel obey mosaic tiling: the activation scales
    ride transposed as (K/tile, M) (full-sublane blocks, dynamic sublane
    index per K-step) and the weight block scales are lane-expanded to
    (K/tile, N) — tiny f32 arrays vs the fp8 operands."""
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2 and sx.shape == (m, k // tile) and sw.shape == (k // tile, n // tile)
    block_k = min(block_k, k)
    assert block_k % tile == 0 and block_n % tile == 0
    inner = block_k // tile

    pm = (-m) % block_m
    pn = (-n) % block_n
    pk = (-k) % block_k
    if pm or pk:
        xq = jnp.pad(xq, ((0, pm), (0, pk)))
        sx = jnp.pad(sx, ((0, pm), (0, pk // tile)))
    if pk or pn:
        wq = jnp.pad(wq, ((0, pk), (0, pn)))
        sw = jnp.pad(sw, ((0, pk // tile), (0, pn // tile)))
    mp, kp = xq.shape
    np_ = wq.shape[1]
    kt = kp // tile
    k_steps = kp // block_k
    grid = (mp // block_m, np_ // block_n, k_steps)

    sx_t = sx.T  # (KT, Mp)
    sw_rep = jnp.repeat(sw, tile, axis=1)  # (KT, Np) lane-expanded

    kern = functools.partial(_gemm_kernel, k_steps=k_steps, inner=inner, tile=tile)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((kt, block_m), lambda i, j, ki: (0, i)),
            pl.BlockSpec((block_k, block_n), lambda i, j, ki: (ki, j)),
            pl.BlockSpec((kt, block_n), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, sx_t, wq, sw_rep)
    if pm or pn:
        out = out[:m, :n]
    return out


def fp8_gemm_tilewise_emulated(xq, sx, wq, sw, *, tile: int = 128,
                               out_dtype=jnp.bfloat16):
    """Numerically-equivalent jnp path (CPU tests / non-TPU backends): f32
    dequant then one f32 GEMM — identical per-tile-scaled products, different
    only in fp32 summation order."""
    m, k = xq.shape
    n = wq.shape[1]
    xd = xq.astype(jnp.float32).reshape(m, k // tile, tile) * sx[..., None]
    wd = wq.astype(jnp.float32).reshape(k // tile, tile, n // tile, tile) \
        * sw[:, None, :, None]
    y = jax.lax.dot_general(xd.reshape(m, k), wd.reshape(k, n),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(out_dtype)
