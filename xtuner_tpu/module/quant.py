"""NF4 block quantization (QLoRA).

Reference capability: legacy v0 QLoRA (xtuner/model/sft.py:161-171,
quantization_config w/ bitsandbytes nf4). TPU design: frozen base weights are
stored as 4-bit NF4 codes (two per uint8) with per-block absmax scales and
dequantized to bf16 at use — XLA lowers the 16-entry codebook lookup to a
gather fused into the matmul's producer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# NF4 codebook: quantiles of N(0,1) normalized to [-1, 1] (QLoRA paper, Appx E)
NF4_CODE = np.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
], dtype=np.float32)

BLOCK = 64


def quantize_nf4(w: np.ndarray, block: int = BLOCK) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: w (any shape, size % (2*block) == 0) ->
    (codes uint8 (n//2,), absmax fp32 (n//block,))."""
    flat = np.asarray(w, np.float32).reshape(-1)
    n = flat.size
    assert n % block == 0, (n, block)
    blocks = flat.reshape(-1, block)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.maximum(absmax, 1e-12)
    normed = blocks / absmax[:, None]
    idx = np.abs(normed[..., None] - NF4_CODE).argmin(-1).astype(np.uint8).reshape(-1)
    packed = (idx[0::2] << 4) | idx[1::2]
    return packed.astype(np.uint8), absmax.astype(np.float32)


def dequantize_nf4(codes, absmax, shape: tuple[int, ...], block: int = BLOCK,
                   dtype=jnp.bfloat16):
    """Device-side: -> dense array of `shape`."""
    hi = (codes >> 4).astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-1).reshape(-1)  # interleave back
    lut = jnp.asarray(NF4_CODE)
    vals = jnp.take(lut, idx)
    vals = vals.reshape(-1, block) * absmax[:, None]
    return vals.reshape(shape).astype(dtype)
