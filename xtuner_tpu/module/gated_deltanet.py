"""GatedDeltaNet module (Qwen3.5/Qwen3-Next linear attention).

Reference: xtuner/v1/module/attention/gated_deltanet.py (466 LoC — FLA chunked
delta rule + causal conv1d + gated RMSNorm; custom SP via specialized
all-to-alls). The recurrence lives in ops/gated_deltanet.py; this module adds
the projections: fused qkvz/ba in-projections, short causal depthwise conv
(document-boundary aware), l2-normalized q/k, a(decay)/b(lr) gating heads,
and the gated RMSNorm output path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from ..ops.gated_deltanet import gated_delta_rule_chunked
from .params import ParamSpec


class GatedDeltaNetConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    num_v_heads: int = 8
    num_k_heads: int = 4
    head_k_dim: int = 64
    head_v_dim: int = 64
    conv_kernel_size: int = 4
    rms_norm_eps: float = 1e-6
    chunk_size: int = 64

    @property
    def qk_dim(self) -> int:
        return self.num_k_heads * self.head_k_dim

    @property
    def v_dim(self) -> int:
        return self.num_v_heads * self.head_v_dim

    @property
    def conv_channels(self) -> int:
        return 2 * self.qk_dim + self.v_dim


def gdn_param_specs(cfg: GatedDeltaNetConfig, hidden_size: int,
                    init_scale: float = 0.02) -> dict:
    h = hidden_size
    return {
        # fused q,k,v,z projection (reference in_proj_qkvz)
        "in_proj_qkvz": {"w": ParamSpec((h, 2 * cfg.qk_dim + 2 * cfg.v_dim),
                                        ("embed_shard", "heads"), scale=init_scale)},
        # b (delta lr) + a (decay input) heads
        "in_proj_ba": {"w": ParamSpec((h, 2 * cfg.num_v_heads), ("embed_shard", None),
                                      scale=init_scale)},
        # depthwise causal conv over concat(q, k, v)
        "conv_w": ParamSpec((cfg.conv_kernel_size, cfg.conv_channels), (None, "heads"),
                            scale=init_scale),
        "a_log": ParamSpec((cfg.num_v_heads,), (None,), init="zeros"),
        "dt_bias": ParamSpec((cfg.num_v_heads,), (None,), init="zeros"),
        "norm": ParamSpec((cfg.head_v_dim,), (None,), init="ones"),
        "out_proj": {"w": ParamSpec((cfg.v_dim, h), ("heads", "embed_shard"),
                                    scale=init_scale)},
    }


def _causal_depthwise_conv(x, w, segment_ids=None):
    """x: (B, L, C); w: (K, C). Per-channel causal conv; taps never cross
    document boundaries (packed-varlen semantics)."""
    k = w.shape[0]
    out = x * w[-1]
    for i in range(1, k):
        shifted = jnp.pad(x, ((0, 0), (i, 0), (0, 0)))[:, :-i or None][:, : x.shape[1]]
        if segment_ids is not None:
            seg_shift = jnp.pad(segment_ids, ((0, 0), (i, 0)))[:, : x.shape[1]]
            same = (seg_shift == segment_ids) & (segment_ids != 0)
            shifted = jnp.where(same[..., None], shifted, 0.0)
        out = out + shifted * w[-1 - i]
    return out


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def _conv_with_buffer(x, w, buf, n_valid=None):
    """Causal depthwise conv continued from a rolling buffer of the previous
    K-1 inputs (decode analog of _causal_depthwise_conv; reference
    causal_conv1d's cache path). x: (B, C, ch); buf: (B, K-1, ch).
    Returns (out (B, C, ch), new_buf).

    `n_valid` (B,) int32: RIGHT-padded chunks — only the first n_valid tokens
    of x are real, so the rolling buffer must end at token n_valid-1, not at
    the chunk's padded tail (ext index of real token t is K-1+t)."""
    k = w.shape[0]
    ext = jnp.concatenate([buf.astype(x.dtype), x], axis=1)  # (B, K-1+C, ch)
    out = jnp.zeros_like(x)
    c = x.shape[1]
    for i in range(k):
        out = out + ext[:, k - 1 - i: k - 1 - i + c] * w[-1 - i]
    if k <= 1:
        new_buf = buf
    elif n_valid is None:
        new_buf = ext[:, -(k - 1):]
    else:
        idx = n_valid[:, None] + jnp.arange(k - 1, dtype=jnp.int32)[None]
        new_buf = jnp.take_along_axis(ext, idx[..., None], axis=1)
    return out, new_buf


def gdn_cached_forward(p: dict, cfg: GatedDeltaNetConfig, x, state, conv_buf,
                       valid=None, n_valid=None):
    """Incremental GDN for generation: x (B, C, H) chunk (prefill) or C=1
    decode step; state (B, Hv, dk, dv) f32 fast-weight matrix; conv_buf
    (B, K-1, qk_dim*2+v_dim) rolling conv inputs. O(1) memory per token —
    the linear-attention decode win (no KV cache at all).

    Returns (out (B, C, H), state', conv_buf'). Matches gdn_forward exactly
    when chained over the same tokens (single document; packed resets are a
    training-only concern). `valid` (B, C) bool masks LEFT-PAD prompt slots:
    their inputs are zeroed before the conv and their state update is a
    no-op (alpha=1, beta=0), so padding never contaminates the recurrence.
    `n_valid` (B,): RIGHT-pad prompt counts (paged-engine prefill) — keeps
    the conv rolling buffer anchored at the last REAL token."""
    from ..ops.gated_deltanet import gated_delta_rule_scan

    b, c, _ = x.shape
    hk, hv = cfg.num_k_heads, cfg.num_v_heads
    dk, dv = cfg.head_k_dim, cfg.head_v_dim

    if valid is not None:
        x = jnp.where(valid[..., None], x, 0.0)
    qkvz = x @ p["in_proj_qkvz"]["w"]
    q, k, v, z = jnp.split(qkvz, [cfg.qk_dim, 2 * cfg.qk_dim, 2 * cfg.qk_dim + cfg.v_dim],
                           axis=-1)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    qkv, conv_buf = _conv_with_buffer(qkv, p["conv_w"], conv_buf, n_valid)
    qkv = jax.nn.silu(qkv)
    q, k, v = jnp.split(qkv, [cfg.qk_dim, 2 * cfg.qk_dim], axis=-1)

    q = _l2norm(q.reshape(b, c, hk, dk))
    k = _l2norm(k.reshape(b, c, hk, dk))
    v = v.reshape(b, c, hv, dv)

    ba = x @ p["in_proj_ba"]["w"]
    b_lr, a_in = jnp.split(ba, 2, axis=-1)
    beta = jax.nn.sigmoid(b_lr.astype(jnp.float32))
    g = -jnp.exp(p["a_log"].astype(jnp.float32)) * jax.nn.softplus(
        a_in.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    alpha = jnp.exp(g)
    if valid is not None:  # pad slots: no decay, no write
        alpha = jnp.where(valid[..., None], alpha, 1.0)
        beta = jnp.where(valid[..., None], beta, 0.0)

    rep = hv // hk
    if rep > 1:
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)

    o, state = gated_delta_rule_scan(q, k, v, alpha, beta, segment_ids=None,
                                     initial_state=state, return_state=True)

    z = z.reshape(b, c, hv, dv).astype(jnp.float32)
    o32 = o.astype(jnp.float32)
    o32 = o32 * jax.lax.rsqrt(jnp.mean(jnp.square(o32), axis=-1, keepdims=True)
                              + cfg.rms_norm_eps)
    o32 = o32 * p["norm"].astype(jnp.float32) * jax.nn.silu(z)
    o = o32.reshape(b, c, cfg.v_dim).astype(x.dtype)
    return o @ p["out_proj"]["w"], state, conv_buf


def gdn_forward(p: dict, cfg: GatedDeltaNetConfig, x, segment_ids=None,
                sc=None):
    """x: (B, L, H) -> (B, L, H).

    Sequence parallelism (`sc`: ShardCtx): the reference ships a dedicated
    4-all-to-all SP path for GatedDeltaNet (ref gated_deltanet.py:25-43,
    forward_for_sp :188) because the delta-rule recurrence needs the FULL
    sequence. TPU redesign: the projections and the causal conv stay
    seq-sharded (GSPMD partitions the conv's shifted pads with K-1-token
    halo exchanges automatically); only the recurrence inputs are
    constraint-flipped seq-sharded -> head-sharded (XLA inserts the
    all_to_alls — the same Ulysses trick as module/attention.py), so each
    device runs the full-length recurrence on Hv/sp heads, then the output
    flips back. No full-seq allgather of activations ever materializes."""
    b, l, _ = x.shape
    hk, hv = cfg.num_k_heads, cfg.num_v_heads
    dk, dv = cfg.head_k_dim, cfg.head_v_dim

    qkvz = x @ p["in_proj_qkvz"]["w"]
    q, k, v, z = jnp.split(qkvz, [cfg.qk_dim, 2 * cfg.qk_dim, 2 * cfg.qk_dim + cfg.v_dim],
                           axis=-1)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    qkv = jax.nn.silu(_causal_depthwise_conv(qkv, p["conv_w"], segment_ids))
    q, k, v = jnp.split(qkv, [cfg.qk_dim, 2 * cfg.qk_dim], axis=-1)

    q = _l2norm(q.reshape(b, l, hk, dk))
    k = _l2norm(k.reshape(b, l, hk, dk))
    v = v.reshape(b, l, hv, dv)

    ba = x @ p["in_proj_ba"]["w"]
    b_lr, a_in = jnp.split(ba, 2, axis=-1)  # (B, L, Hv) each
    beta = jax.nn.sigmoid(b_lr.astype(jnp.float32))
    g = -jnp.exp(p["a_log"].astype(jnp.float32)) * jax.nn.softplus(
        a_in.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    alpha = jnp.exp(g)  # (0, 1]

    rep = hv // hk
    if rep > 1:
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)

    if sc is not None:
        # Ulysses flip: seq-sharded -> head-sharded (all_to_all over sp)
        q = sc(q, "batch", None, "act_heads", None)
        k = sc(k, "batch", None, "act_heads", None)
        v = sc(v, "batch", None, "act_heads", None)
        alpha = sc(alpha, "batch", None, "act_heads")
        beta = sc(beta, "batch", None, "act_heads")

    o = gated_delta_rule_chunked(q, k, v, alpha, beta, segment_ids, cfg.chunk_size)

    if sc is not None:
        o = sc(o, "batch", "seq", None, None)  # flip back (reverse a2a)

    # gated RMSNorm (FLA FusedRMSNormGated): rms_norm(o) * silu(z), per head
    z = z.reshape(b, l, hv, dv).astype(jnp.float32)
    o32 = o.astype(jnp.float32)
    o32 = o32 * jax.lax.rsqrt(jnp.mean(jnp.square(o32), axis=-1, keepdims=True)
                              + cfg.rms_norm_eps)
    o32 = o32 * p["norm"].astype(jnp.float32) * jax.nn.silu(z)
    o = o32.reshape(b, l, cfg.v_dim).astype(x.dtype)
    return o @ p["out_proj"]["w"]
