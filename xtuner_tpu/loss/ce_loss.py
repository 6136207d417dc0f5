"""Cross-entropy loss with global calibration and chunked logits.

Reference: xtuner/v1/loss/ce_loss.py + chunk_loss.py.

Two properties carried over:

1. **Global loss calibration** (ce_loss.py:125-189): per-token weights are
   built from the reduction mode, and the denominator is the *global* sum of
   weights over the whole optimizer batch — so the loss value is invariant to
   dp/sp/packing layout and gradient-accumulation count. Under GSPMD the
   "all-reduce over world" is just `jnp.sum` of a globally-sharded array.

2. **Chunked CE** (chunk_loss.py:7-70): the (tokens, vocab) logits matrix is
   never materialized. The reference uses a custom autograd.Function; here a
   `lax.scan` over token chunks wrapped in `jax.checkpoint` gives the same
   memory profile — backward recomputes each chunk's logits.

Weights per reduction mode (loss = sum(w*ce) / sum_global(w)):
- token:  w = 1 per supervised token
- sample: w = 1/len(doc)  (each sample contributes equally)
- square: w = 1/sqrt(len(doc))
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

IGNORE_IDX = -100


class CELossConfig(BaseModel):
    """API analog of reference CELossConfig (ce_loss.py:22). mode="fused" is
    the liger-kernel analog: a Pallas sweep over vocab tiles that keeps the
    logits in VMEM only (ops/fused_ce.py); falls back to "chunk" when the
    head has a bias or the shapes don't tile."""

    model_config = ConfigDict(extra="forbid")
    mode: Literal["eager", "chunk", "fused"] = "chunk"
    chunk_size: int = 1024
    loss_reduction: Literal["token", "sample", "square"] = "token"
    ignore_idx: int = IGNORE_IDX


def build_loss_weights(shifted_labels: np.ndarray, doc_lens_per_token: np.ndarray,
                       reduction: str = "token") -> np.ndarray:
    """Host-side (collator) weight computation.

    shifted_labels: (B, L) int; doc_lens_per_token: (B, L) = number of
    *supervised* tokens in the token's document (0 for padding).
    """
    valid = shifted_labels != IGNORE_IDX
    if reduction == "token":
        w = valid.astype(np.float32)
    elif reduction == "sample":
        w = np.where(valid, 1.0 / np.maximum(doc_lens_per_token, 1), 0.0).astype(np.float32)
    elif reduction == "square":
        w = np.where(valid, 1.0 / np.sqrt(np.maximum(doc_lens_per_token, 1)), 0.0).astype(np.float32)
    else:
        raise ValueError(f"Unknown loss reduction {reduction!r}")
    return w


def _fused_ce(hidden, lm_head_w, labels, ignore_idx: int, sc=None):
    """Pallas fused CE stats; shard-mapped over the token axes when a mesh is
    present (tokens stay sharded; the fsdp-sharded head weight is gathered
    inside the block, its transpose a reduce-scatter — FSDP semantics).

    The kernel is vocab-major: for the tied path `lm_head_w` arrived as
    `embed.T`, so the `.T` here cancels under XLA and the kernel reads the
    embedding with NO transpose or pad copy (ops/fused_ce.py docstring)."""
    from ..ops.fused_ce import ce_stats_vh

    valid = labels != ignore_idx
    safe = jnp.where(valid, labels, 0)
    w_vh = lm_head_w.T  # (V, H)

    if sc is None or sc.mesh is None:
        lse, lab = ce_stats_vh(hidden, w_vh, safe)
        return jnp.where(valid, lse - lab, 0.0)

    from jax.sharding import PartitionSpec as P

    mesh = sc.mesh
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def axes_of(name):
        phys = sc.rules.get(name)
        if phys is None:
            return ()
        phys = phys if isinstance(phys, tuple) else (phys,)
        return tuple(a for a in phys if sizes.get(a, 1) > 1)

    tok_axes = axes_of("batch") + axes_of("seq")
    w_axes = axes_of("embed_shard")  # shards H = dim 1 of (V, H)
    if not tok_axes and not w_axes:
        lse, lab = ce_stats_vh(hidden, w_vh, safe)
        return jnp.where(valid, lse - lab, 0.0)

    def block(h_, w_, lab_):
        for a in w_axes:
            w_ = jax.lax.all_gather(w_, a, axis=1, tiled=True)
        return ce_stats_vh(h_, w_, lab_)

    lse, lab = jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(tok_axes or None, None), P(None, w_axes or None),
                  P(tok_axes or None)),
        out_specs=(P(tok_axes or None), P(tok_axes or None)),
        check_vma=False,
    )(hidden, w_vh, safe)
    return jnp.where(valid, lse - lab, 0.0)


def _ce_from_logits(logits, labels, ignore_idx: int):
    """logits (N, V) fp32, labels (N,) -> per-token CE with 0 at ignored."""
    valid = labels != ignore_idx
    safe_labels = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    return jnp.where(valid, lse - picked, 0.0)


def ce_loss(hidden, lm_head_w, shifted_labels, loss_weights, global_denom,
            cfg: CELossConfig, lm_head_b=None, sc=None):
    """Fused LMHead + CE (the reference's LMHead->loss_ctx.forward fusion,
    lm_head/lm_head.py:20-49).

    hidden: (B, L, H) compute-dtype; lm_head_w: (H, V);
    shifted_labels/loss_weights: (B, L); global_denom: scalar (sum of weights
    over the WHOLE optimizer batch, precomputed by the engine).

    Returns (loss, sum_ce, num_tokens): `loss` is calibrated for backward;
    sum_ce/num_tokens let the trainer log the plain mean CE.
    """
    b, l, h = hidden.shape
    n = b * l
    hidden = hidden.reshape(n, h)
    labels = shifted_labels.reshape(n)
    weights = loss_weights.reshape(n).astype(jnp.float32)

    if cfg.mode == "fused" and lm_head_b is None and hidden.shape[-1] % 128 == 0:
        ce = _fused_ce(hidden, lm_head_w, labels, cfg.ignore_idx, sc)
    elif cfg.mode == "eager" or n <= cfg.chunk_size:
        logits = jnp.dot(hidden, lm_head_w, preferred_element_type=jnp.float32)
        if lm_head_b is not None:
            logits = logits + lm_head_b
        ce = _ce_from_logits(logits, labels, cfg.ignore_idx)
    else:
        chunk = cfg.chunk_size
        num_chunks = -(-n // chunk)
        pad = num_chunks * chunk - n
        if pad:
            hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
            labels = jnp.pad(labels, (0, pad), constant_values=cfg.ignore_idx)

        # scan over chunk STARTS with dynamic_slice — not a reshape to
        # (num_chunks, chunk, h): the stacked form forces a full layout copy
        # of the hidden states when the layer scan's carry layout differs
        # (~130 ms at 64k) and trips SPMD resharding on (fsdp, ep) meshes
        @jax.checkpoint
        def chunk_fn(carry, start):
            h_c = jax.lax.dynamic_slice_in_dim(hidden, start, chunk, axis=0)
            lab_c = jax.lax.dynamic_slice_in_dim(labels, start, chunk, axis=0)
            if sc is not None:
                # anchor the remat'd body (and its cotangent) to a
                # token-sharded layout
                h_c = sc(h_c, ("batch", "seq"), None)
            logits = jnp.dot(h_c, lm_head_w, preferred_element_type=jnp.float32)
            if sc is not None:
                # token-parallel logits: all-gather the (small) head shard
                # instead of contracting-dim partitioning, so the transpose's
                # dh_c lands token-sharded
                logits = sc(logits, ("batch", "seq"), "act_vocab")
            if lm_head_b is not None:
                logits = logits + lm_head_b
            return carry, _ce_from_logits(logits, lab_c, cfg.ignore_idx)

        starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
        _, ce = jax.lax.scan(chunk_fn, 0.0, starts)
        ce = ce.reshape(-1)[:n]

    loss = jnp.sum(ce * weights) / jnp.maximum(global_denom, 1e-8)
    valid = shifted_labels.reshape(n) != cfg.ignore_idx
    sum_ce = jnp.sum(ce * valid)
    num_tokens = jnp.sum(valid)
    return loss, sum_ce, num_tokens


def per_token_logprobs(hidden, lm_head_w, shifted_labels, chunk_size: int = 1024,
                       ignore_idx: int = IGNORE_IDX, sc=None, mode: str = "chunk"):
    """(B, L) log p(label_t | context) — differentiable, logits never
    materialized (the RL actor/ref logprob path; reference rl/loss/base_loss.py
    recomputes actor logprobs through the same chunked machinery).
    mode="fused" uses the Pallas CE-stats kernel (ops/fused_ce.py)."""
    b, l, h = hidden.shape
    n = b * l
    if mode == "fused" and h % 128 == 0:
        ce = _fused_ce(hidden.reshape(n, h), lm_head_w,
                       shifted_labels.reshape(n), ignore_idx, sc)
        return -ce.reshape(b, l)
    hidden = hidden.reshape(n, h)
    labels = shifted_labels.reshape(n)
    chunk = min(chunk_size, n)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=ignore_idx)

    @jax.checkpoint
    def chunk_fn(carry, start):
        h_c = jax.lax.dynamic_slice_in_dim(hidden, start, chunk, axis=0)
        lab_c = jax.lax.dynamic_slice_in_dim(labels, start, chunk, axis=0)
        if sc is not None:
            h_c = sc(h_c, ("batch", "seq"), None)
        logits = jnp.dot(h_c, lm_head_w, preferred_element_type=jnp.float32)
        return carry, -_ce_from_logits(logits, lab_c, ignore_idx)

    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    _, lps = jax.lax.scan(chunk_fn, 0.0, starts)
    return lps.reshape(-1)[:n].reshape(b, l)
