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
    # quantize incoming grads to e5m2 in backward (reference e5m2 grad path);
    # False = fp8 forward, bf16 backward
    e5m2_grads: bool = False


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


def _tile_dot(a, b, tile: int, out_dtype, a_dtype=jnp.float8_e4m3fn,
              b_dtype=jnp.float8_e4m3fn):
    """a (M, K) x b (K, N) through the REAL tile-wise fp8 path: a quantized
    per (row, K-tile), b per (K-tile, N-tile) block, fp8 GEMM with per-tile
    rescale in the fp32 accumulator (Pallas kernel on TPU; numerically
    equivalent jnp emulation elsewhere). Mirrors reference
    float8_linear_tile_wise.py:34-182. K/N are zero-padded to tile multiples."""
    from .fp8_gemm import (fp8_gemm_tilewise, fp8_gemm_tilewise_emulated,
                           quantize_blockwise, quantize_tilewise)

    k, n = b.shape
    pk, pn = (-k) % tile, (-n) % tile
    if pk:
        a = jnp.pad(a, ((0, 0), (0, pk)))
    if pk or pn:
        b = jnp.pad(b, ((0, pk), (0, pn)))
    aq, sa = quantize_tilewise(a, tile, a_dtype)
    bq, sb = quantize_blockwise(b, tile, b_dtype)
    fn = fp8_gemm_tilewise if jax.default_backend() == "tpu" else fp8_gemm_tilewise_emulated
    y = fn(aq, sa, bq, sb, tile=tile, out_dtype=out_dtype)
    return y[:, :n] if pn else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fp8_matmul(x, w, granularity: str = "tilewise", tile: int = 128,
               e5m2_grads: bool = False):
    """y = x @ w with fp8 operands. x: (..., K); w: (K, N).

    tensorwise: one amax scale per tensor, single fp8 dot.
    tilewise: real per-tile-scaled fp8 GEMM (see _tile_dot) for the forward
    AND both backward GEMMs; grads quantized to e5m2 when `e5m2_grads`
    (reference float8_linear_tile_wise dgrad/wgrad path), bf16 otherwise.
    """
    return _fp8_matmul_fwd(x, w, granularity, tile, e5m2_grads)[0]


def _fp8_matmul_fwd(x, w, granularity, tile, e5m2_grads):
    if granularity == "tensorwise":
        xq, sx = quantize_e4m3(x, "tensorwise")
        wq, sw = quantize_e4m3(w, "tensorwise")
        y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = (y * (sx * sw)).astype(x.dtype)
    else:
        *lead, k = x.shape
        y = _tile_dot(x.reshape(-1, k), w, tile, x.dtype).reshape(*lead, w.shape[1])
    return y, (x, w)


def _fp8_matmul_bwd(granularity, tile, e5m2_grads, res, g):
    x, w = res
    *lead, k = x.shape
    n = w.shape[1]
    g2d = g.reshape(-1, n)
    x2d = x.reshape(-1, k)
    if granularity == "tilewise" and e5m2_grads:
        # dgrad: g (M, N) x w^T (N, K) — g per-row N-tiles in e5m2, w^T blocks
        dx = _tile_dot(g2d, w.T, tile, x.dtype, a_dtype=jnp.float8_e5m2)[:, :k]
        # wgrad: x^T (K, M) x g (M, N) — x^T per-row M-tiles, g (M, N) blocks
        # in e5m2 (requantized along the contraction dim, reference wgrad)
        dw = _tile_dot(x2d.T, g2d, tile, w.dtype,
                       b_dtype=jnp.float8_e5m2)[:, :n]
    else:
        gb = g2d.astype(jnp.bfloat16)
        dx = jax.lax.dot_general(gb, w.astype(jnp.bfloat16).T,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(x.dtype)
        dw = jax.lax.dot_general(x2d.astype(jnp.bfloat16), gb,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(w.dtype)
    return dx.reshape(x.shape), dw


fp8_matmul.defvjp(_fp8_matmul_fwd, _fp8_matmul_bwd)
