"""Rotary embedding frequency computation + scaling variants.

Reference: xtuner/v1/module/rope/rope.py (RopeScalingConfig types
default/linear/dynamic/yarn/llama3, RotaryEmbedding :293). Computed on the fly
from position ids — no cached buffers; XLA constant-folds the inv_freq math.
"""

from __future__ import annotations

import math
from typing import Literal, Optional

import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict


class RopeScalingConfig(BaseModel):
    """Mirrors the reference RopeScalingConfig surface (rope.py:33-78)."""

    model_config = ConfigDict(extra="forbid")
    rope_type: Literal["default", "linear", "dynamic", "yarn", "longrope", "llama3", "qwen3_vl"] = "default"
    factor: float = 1.0
    # longrope (Phi-3 family; HF _compute_longrope_parameters parity):
    # per-frequency rescale lists + optional explicit attention factor
    short_factor: Optional[list[float]] = None
    long_factor: Optional[list[float]] = None
    attention_factor: Optional[float] = None
    # qwen3_vl interleaved MRoPE: frequency pairs owned by (t, h, w)
    mrope_section: Optional[list[int]] = None
    # FoPE — Fourier position embedding (reference rope.py:405-515
    # FourierEmbedding): LEARNED mixing of the rotary sin/cos basis; under-
    # trained (too-low) frequencies are dropped and the coefficient matrices
    # are trained parameters (see fope_param_specs / fope_cos_sin)
    use_fope: bool = False
    num_inv_freq: Optional[int] = None
    fope_init_factor: float = 1.0
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0
    original_max_position_embeddings: Optional[int] = None
    # llama3
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0


def _rope_dim(attn_cfg) -> int:
    """Rotary dim of an attention config: MHA partial_rotary_factor aware;
    MLA's `head_dim` property already IS the rope dim."""
    return getattr(attn_cfg, "rope_dim", attn_cfg.head_dim)


def _base_inv_freq(head_dim: int, theta: float):
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def compute_inv_freq_and_scale(head_dim: int, theta: float,
                               scaling: Optional[RopeScalingConfig] = None,
                               max_position_embeddings: int = 4096):
    """Returns (inv_freq (head_dim//2,), attention_scaling scalar)."""
    inv_freq = _base_inv_freq(head_dim, theta)
    if scaling is None or scaling.rope_type in ("default", "qwen3_vl"):
        return inv_freq, 1.0
    if scaling.rope_type == "linear":
        return inv_freq / scaling.factor, 1.0
    if scaling.rope_type == "dynamic":
        # NTK-aware: rescale theta for the training max length
        base = theta * (scaling.factor ** (head_dim / (head_dim - 2)))
        return _base_inv_freq(head_dim, base), 1.0
    if scaling.rope_type == "llama3":
        orig = scaling.original_max_position_embeddings or max_position_embeddings
        low_wl = orig / scaling.low_freq_factor
        high_wl = orig / scaling.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        smooth = (orig / wavelen - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / scaling.factor
        blended = (1 - smooth) * scaled + smooth * inv_freq
        out = jnp.where(wavelen > low_wl, scaled, jnp.where(wavelen < high_wl, inv_freq, blended))
        return out, 1.0
    if scaling.rope_type == "yarn":
        orig = scaling.original_max_position_embeddings or max_position_embeddings

        def find_dim(num_rot):
            return (head_dim * math.log(orig / (num_rot * 2 * math.pi))) / (2 * math.log(theta))

        low = max(math.floor(find_dim(scaling.beta_fast)), 0)
        high = min(math.ceil(find_dim(scaling.beta_slow)), head_dim // 2 - 1)
        ramp = jnp.clip(
            (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / max(high - low, 1e-3), 0, 1
        )
        inv_freq_interp = inv_freq / scaling.factor
        out = inv_freq_interp * ramp + inv_freq * (1 - ramp)

        def get_mscale(scale, m):
            if scale <= 1 or m == 0:
                return 1.0
            return 0.1 * m * math.log(scale) + 1.0

        att_scale = get_mscale(scaling.factor, scaling.mscale) / get_mscale(
            scaling.factor, scaling.mscale_all_dim
        ) if scaling.mscale_all_dim else get_mscale(scaling.factor, scaling.mscale)
        return out, float(att_scale)
    if scaling.rope_type == "longrope":
        # HF _compute_longrope_parameters parity (Phi-3/LongRoPE): the model's
        # deployed max length stands in for the runtime seq_len — long_factor
        # applies when extending past the pretrained window, short_factor
        # otherwise. inv_freq_i /= ext_factor_i; cos/sin scaled by
        # sqrt(1 + ln(factor)/ln(orig)) unless given explicitly.
        orig = scaling.original_max_position_embeddings or max_position_embeddings
        factor = (max_position_embeddings / orig
                  if scaling.original_max_position_embeddings else scaling.factor)
        att = scaling.attention_factor
        if att is None:
            att = 1.0 if factor <= 1.0 else math.sqrt(1 + math.log(factor) / math.log(orig))
        use_long = max_position_embeddings > orig
        ext = (scaling.long_factor if use_long else scaling.short_factor) or [1.0]
        ext_factors = jnp.asarray(ext, jnp.float32)
        return inv_freq / ext_factors, float(att)
    raise ValueError(f"Unknown rope_type {scaling.rope_type}")


def rope_cos_sin(position_ids, head_dim: int, theta: float,
                 scaling: Optional[RopeScalingConfig] = None,
                 max_position_embeddings: int = 4096):
    """position_ids (B, L) int32 -> cos, sin (B, L, head_dim) fp32."""
    inv_freq, att_scale = compute_inv_freq_and_scale(
        head_dim, theta, scaling, max_position_embeddings
    )
    freqs = position_ids.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * att_scale, jnp.sin(emb) * att_scale


def mrope_cos_sin(position_ids_3d, head_dim: int, theta: float,
                  mrope_section: tuple[int, ...] = (16, 24, 24)):
    """Qwen-VL multimodal rotary embedding (reference:
    datasets/mllm_tokenize_fn/qwenvl_rope2d.py + rope.py qwen3_vl type).

    position_ids_3d: (3, B, L) int32 — (temporal, height, width) positions
    per token (text tokens carry the same value in all three).
    mrope_section: how many rotary FREQUENCY PAIRS each of (t, h, w) owns;
    must sum to head_dim // 2. Returns cos, sin (B, L, head_dim) fp32.
    """
    assert sum(mrope_section) == head_dim // 2, (mrope_section, head_dim)
    inv_freq = _base_inv_freq(head_dim, theta)  # (head_dim//2,)
    freqs = position_ids_3d.astype(jnp.float32)[..., None] * inv_freq  # (3, B, L, hd/2)
    # select which axis (t/h/w) provides each frequency band
    import numpy as _np

    sel = _np.concatenate([
        _np.full(n, i, dtype=_np.int32) for i, n in enumerate(mrope_section)
    ])  # (hd/2,)
    sel = jnp.asarray(sel)
    picked = jnp.take_along_axis(
        freqs, sel[None, None, :, None].transpose(3, 0, 1, 2), axis=0
    )[0]  # (B, L, hd/2)
    emb = jnp.concatenate([picked, picked], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def fope_num_freqs(head_dim: int, theta: float, scaling: "RopeScalingConfig",
                   max_position_embeddings: int) -> int:
    """Count of retained frequencies: explicit num_inv_freq or all with more
    than one full period inside the context (reference
    _compute_fope_parameters, rope.py:383-402)."""
    import numpy as _np

    inv = 1.0 / (theta ** (_np.arange(0, head_dim, 2, dtype=_np.float64) / head_dim))
    if scaling.num_inv_freq is not None:
        return int(scaling.num_inv_freq)
    return int((inv > 2.0 * _np.pi / max_position_embeddings).sum())


def fope_param_specs(head_dim: int, theta: float, scaling: "RopeScalingConfig",
                     max_position_embeddings: int) -> dict:
    """Learned (n, n) sin/cos mixing matrices, init identity + xavier noise
    scaled by fope_init_factor (reference rope.py:442-453)."""
    from .params import ParamSpec

    n = fope_num_freqs(head_dim, theta, scaling, max_position_embeddings)
    std = scaling.fope_init_factor / math.sqrt(n)
    return {
        "sin_coef": ParamSpec((n, n), (None, None), init="eye_plus_normal", scale=std),
        "cos_coef": ParamSpec((n, n), (None, None), init="eye_plus_normal", scale=std),
    }


def fope_cos_sin(position_ids, head_dim: int, theta: float,
                 scaling: "RopeScalingConfig", max_position_embeddings: int,
                 fope_params: dict):
    """position_ids (B, L) -> cos, sin (B, L, head_dim) with the learned
    Fourier mixing; dropped-frequency slots pad with 1.0 (reference
    rope.py:470-508 — pad value 1 keeps those dims un-rotated-ish)."""
    n = fope_num_freqs(head_dim, theta, scaling, max_position_embeddings)
    inv = _base_inv_freq(head_dim, theta)[:n]
    freqs = position_ids.astype(jnp.float32)[:, :, None] * inv  # (B, L, n)
    sin = jnp.sin(freqs) @ fope_params["sin_coef"].astype(jnp.float32)
    cos = jnp.cos(freqs) @ fope_params["cos_coef"].astype(jnp.float32)
    pad = head_dim // 2 - n
    if pad > 0:
        ones = jnp.ones((*sin.shape[:-1], pad), jnp.float32)
        sin = jnp.concatenate([sin, ones], axis=-1)
        cos = jnp.concatenate([cos, ones], axis=-1)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1))


def mrope_cos_sin_interleaved(position_ids_3d, head_dim: int, theta: float,
                              mrope_section: tuple[int, ...] = (24, 20, 20)):
    """Qwen3-VL interleaved MRoPE (reference rope.py:545-561
    apply_interleaved_mrope): instead of chunked [T..T H..H W..W] frequency
    bands, H owns indices 1,4,7,..<3*sec_h and W owns 2,5,8,..<3*sec_w of the
    T-frequency layout — preserving frequency continuity.

    position_ids_3d: (3, B, L) int32. Returns cos, sin (B, L, head_dim) fp32.
    """
    import numpy as _np

    inv_freq = _base_inv_freq(head_dim, theta)  # (hd/2,)
    sel = _np.zeros(head_dim // 2, dtype=_np.int32)
    sel[1:mrope_section[1] * 3:3] = 1
    sel[2:mrope_section[2] * 3:3] = 2
    freqs = position_ids_3d.astype(jnp.float32)[..., None] * inv_freq  # (3, B, L, hd/2)
    picked = jnp.take_along_axis(
        freqs, jnp.asarray(sel)[None, None, :, None].transpose(3, 0, 1, 2), axis=0
    )[0]  # (B, L, hd/2)
    emb = jnp.concatenate([picked, picked], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def model_rope_cos_sin(seq_ctx, head_dim: int, theta: float,
                       scaling: Optional[RopeScalingConfig],
                       max_position_embeddings: int, fope_params=None):
    """Model-facing rope dispatch: plain RoPE for text models, interleaved
    MRoPE when the config declares rope_type='qwen3_vl', learned FoPE when
    `use_fope` (cf. reference get_rope_embedding, rope.py:589-605). Text-only
    batches (no mrope_positions) broadcast position_ids into all three axes —
    identical to plain rope because t==h==w for text tokens."""
    if scaling is not None and scaling.use_fope:
        assert fope_params is not None, "FoPE needs the model's fope coef params"
        return fope_cos_sin(seq_ctx.position_ids, head_dim, theta, scaling,
                            max_position_embeddings, fope_params)
    if scaling is not None and scaling.rope_type == "qwen3_vl":
        sec = tuple(scaling.mrope_section or (24, 20, 20))
        assert sum(sec) == head_dim // 2, (sec, head_dim)
        pos3 = seq_ctx.mrope_positions
        if pos3 is None:
            pos3 = jnp.broadcast_to(seq_ctx.position_ids[None],
                                    (3, *seq_ctx.position_ids.shape))
        else:
            pos3 = jnp.transpose(pos3, (1, 0, 2))  # (B, 3, L) -> (3, B, L)
        return mrope_cos_sin_interleaved(pos3, head_dim, theta, sec)
    return rope_cos_sin(seq_ctx.position_ids, head_dim, theta, scaling,
                        max_position_embeddings)


def build_mrope_positions(input_ids, image_token_mask, image_grid_thw, spatial_merge: int = 2):
    """Host-side 3D position construction for a packed row (reference
    qwenvl_rope2d.py): text tokens advance t=h=w together; each image's
    tokens get (t const, h row, w col) over its grid.

    input_ids: (L,) np array; image_token_mask: (L,) bool; image_grid_thw:
    (n_images, 3). Returns (3, L) int32 numpy.
    """
    import numpy as np

    l = len(input_ids)
    pos = np.zeros((3, l), np.int64)
    cursor = 0  # running position value
    img_idx = 0
    t = 0
    i = 0
    while i < l:
        if image_token_mask[i]:
            gt, gh, gw = image_grid_thw[img_idx]
            gh, gw = gh // spatial_merge, gw // spatial_merge
            n = int(gt * gh * gw)
            grid_t = np.repeat(np.arange(gt), gh * gw)
            grid_h = np.tile(np.repeat(np.arange(gh), gw), gt)
            grid_w = np.tile(np.arange(gw), gt * gh)
            pos[0, i:i + n] = cursor + grid_t
            pos[1, i:i + n] = cursor + grid_h
            pos[2, i:i + n] = cursor + grid_w
            cursor += int(max(gt, gh, gw))
            img_idx += 1
            i += n
        else:
            pos[:, i] = cursor
            cursor += 1
            i += 1
    return pos.astype(np.int32)
