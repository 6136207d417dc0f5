"""Fused chunk-free cross-entropy statistics (liger-kernel analog).

Reference: xtuner/v1/loss/ce_loss.py `CELossConfig(mode="liger")` — a fused
kernel that never materializes the (tokens, vocab) logits. The XLA chunked
path (loss/ce_loss.py mode="chunk") still writes each (chunk, vocab) f32
logits block to HBM between fusions (~6 passes of ~1.3 GB per 2k-token chunk
at 152k vocab — the dominant CE cost in the 64k step profile). This Pallas
kernel sweeps vocab TILES with the logits resident in VMEM only, computing
the two per-row statistics CE needs:

    lse[r]         = logsumexp_v(h[r] . w[v])
    label_logit[r] = h[r] . w[labels[r]]

`ce = lse - label_logit` and any weighting/reduction compose outside in jnp;
the custom VJP receives the (g_lse, g_label) cotangents, so the op is usable
for CE loss AND per-token logprobs. Backward recomputes the logits tile-wise
(two sweeps: dh with the tile resident per q-block, dw with it resident per
vocab-block); the label columns' rank-1 terms fold INTO the per-tile grad
coefficient (d logit_rv = p_rv*g_lse_r + 1[v==label_r]*g_lab_r), so no
gather/scatter or (V, H) f32 temp exists outside the kernels.

Layout: the weight is VOCAB-MAJOR (V, H) — the tied embedding's native
layout — so the tied path needs NO (H, V) transpose copy, vocab tiles are
contiguous row slices, and dw comes out directly in embedding layout. A
vocab that doesn't tile (Qwen's 151936 = 2048*74 + 384) is SPLIT: the
aligned prefix goes through the kernel, the ragged tail (<= 2047 rows) is
ordinary XLA ops, and the two merge with `logaddexp` OUTSIDE the custom VJP
so autodiff routes the cotangents — no 300 MB pad copy of the head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention.flash import LN2, LOG2E, NEG_INF

# fwd sweeps 2048-wide tiles, bwd 1024 (scoped-vmem limit); the kernel region
# must be a multiple of both, so the split point aligns to PAD_MULT
PAD_MULT = 2048


def _fwd_kernel(lab_ref, h_ref, w_ref, lse_ref, lablogit_ref, m_scr, l_scr, lab_scr,
                *, block_c, block_v, v_real):
    i, j = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        lab_scr[:] = jnp.zeros_like(lab_scr)

    logits = jax.lax.dot_general(h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if v_real is not None:  # vocab padded up to a tile multiple
        cols_g = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
        logits = jnp.where(cols_g < v_real, logits, NEG_INF)
    s2 = logits * LOG2E
    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s2 - m_new[:, None])
    l_scr[:] = jnp.broadcast_to((l_scr[:, 0] * alpha + jnp.sum(p, axis=1))[:, None],
                                l_scr.shape)
    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)

    # label pick: at most one column of this tile matches each row's label
    lab_local = lab_ref[0] - j * block_v  # (block_c,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
    hit = cols == lab_local[:, None]
    picked = jnp.sum(jnp.where(hit, logits, 0.0), axis=1)
    lab_scr[:] += jnp.broadcast_to(picked[:, None], lab_scr.shape)

    @pl.when(j == nv - 1)
    def _finalize():
        lse_ref[0, :] = (m_scr[:, 0] + jnp.log2(jnp.maximum(l_scr[:, 0], 1e-37))) * LN2
        lablogit_ref[0, :] = lab_scr[:, 0]


def _grad_coeff(logits, lab_ref, g_lse_ref, g_lab_ref, lse_ref, j,
                *, block_c, block_v):
    """Shared bwd coefficient tile: d(logit_rv) = p_rv * g_lse_r +
    1[v == label_r] * g_lab_r. Folding the label rank-1 terms here (instead
    of an XLA gather + (V, H) scatter-add outside) saves ~1 GB of f32 temps
    at 64k tokens x 150k vocab and is mathematically identical."""
    p = jnp.exp2(logits * LOG2E - (lse_ref[0, :] * LOG2E)[:, None])
    lab_local = lab_ref[0] - j * block_v
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
    hit = cols == lab_local[:, None]
    return p * g_lse_ref[0, :][:, None] + jnp.where(hit, g_lab_ref[0, :][:, None], 0.0)


def _dh_kernel(lab_ref, h_ref, w_ref, lse_ref, g_lse_ref, g_lab_ref, dh_ref, dh_scr,
               *, block_c, block_v, v_real):
    i, j = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    w = w_ref[...]
    logits = jax.lax.dot_general(h_ref[...], w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if v_real is not None:
        cols_g = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
        logits = jnp.where(cols_g < v_real, logits, NEG_INF)
    ps = _grad_coeff(logits, lab_ref, g_lse_ref, g_lab_ref, lse_ref, j,
                     block_c=block_c, block_v=block_v).astype(w.dtype)
    dh_scr[:] += jax.lax.dot_general(ps, w, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(j == nv - 1)
    def _finalize():
        dh_ref[...] = dh_scr[:].astype(dh_ref.dtype)


def _dw_kernel(lab_ref, h_ref, w_ref, lse_ref, g_lse_ref, g_lab_ref, dw_ref, dw_scr,
               *, block_c, block_v, v_real):
    j, i = pl.program_id(0), pl.program_id(1)  # vocab-tile outer, rows inner
    nc = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    h = h_ref[...]
    logits = jax.lax.dot_general(h, w_ref[...], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if v_real is not None:
        cols_g = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
        logits = jnp.where(cols_g < v_real, logits, NEG_INF)
    ps = _grad_coeff(logits, lab_ref, g_lse_ref, g_lab_ref, lse_ref, j,
                     block_c=block_c, block_v=block_v).astype(h.dtype)
    dw_scr[:] += jax.lax.dot_general(ps, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(i == nc - 1)
    def _finalize():
        dw_ref[...] = dw_scr[:].astype(dw_ref.dtype)


def _pick_blocks(c, v):
    block_c = 512 if c % 512 == 0 else max(b for b in (256, 128, 64, 32, 16, 8)
                                           if c % b == 0)
    block_v = PAD_MULT
    return block_c, block_v


def _pad_vocab_rows(w, block_v):
    v = w.shape[0]
    pad = (block_v - v % block_v) % block_v
    if pad:
        return jnp.pad(w, ((0, pad), (0, 0))), v
    return w, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ce_lse_and_label_vh(h, w, labels, interpret=None, v_limit=None):
    """h: (C, H) compute dtype; w: (V, H) VOCAB-MAJOR; labels: (C,) int32 IN
    [0, V). Returns (lse (C,) f32, label_logit (C,) f32). Ignore-index rows
    must be pre-clamped to a valid id and masked by the caller.

    v_limit (a PAD_MULT multiple <= V): restrict the sweep to the first
    v_limit vocab rows via the GRID — the kernel consumes the full (V, H)
    array but never visits tail rows, so callers avoid a ~300 MB slice copy
    of a 150k-vocab head; labels must then be < v_limit (see ce_stats_vh).
    dw rows >= v_limit come back zero."""
    out, _ = _ce_fwd(h, w, labels, interpret, v_limit)
    return out


def _run_fwd(h, w, labels, interpret, v_limit):
    c, hd = h.shape
    block_c, block_v = _pick_blocks(c, w.shape[0])
    if v_limit is not None:
        v, v_real = v_limit, None  # grid covers only the aligned prefix
    else:
        w, v_real = _pad_vocab_rows(w, block_v)
        v = w.shape[0]
    lab2 = labels.reshape(1, c).astype(jnp.int32)
    lse, lab_logit = pl.pallas_call(
        functools.partial(_fwd_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(c // block_c, v // block_v),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),  # labels
            pl.BlockSpec((block_c, hd), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, hd), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lab2, h, w)
    return lse[0], lab_logit[0]


def _ce_fwd(h, w, labels, interpret, v_limit=None):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lse, lab_logit = _run_fwd(h, w, labels, interpret, v_limit)
    return (lse, lab_logit), (h, w, labels, lse)


def _ce_bwd(interpret, v_limit, res, gs):
    g_lse, g_lab = gs
    h, w, labels, lse = res
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    c, hd = h.shape
    block_c, block_v = _pick_blocks(c, w.shape[0])
    # backward holds logits + p + ps + the dh/dw scratch at once: halve both
    # tile dims to stay inside the 16MB scoped-vmem budget
    block_v = min(block_v, 1024)
    block_c = min(block_c, 256)
    v_orig = w.shape[0]
    if v_limit is not None:
        v, v_real = v_limit, None
    else:
        w, v_real = _pad_vocab_rows(w, PAD_MULT)  # same pad as fwd -> CSEs
        v = w.shape[0]
    lab2 = labels.reshape(1, c).astype(jnp.int32)
    lse2d = lse.reshape(1, c)
    g_lse2d = g_lse.astype(jnp.float32).reshape(1, c)
    g_lab2d = g_lab.astype(jnp.float32).reshape(1, c)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(c // block_c, v // block_v),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
            pl.BlockSpec((block_c, hd), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, hd), lambda i, j: (j, 0)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((block_c, hd), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hd), h.dtype),
        scratch_shapes=[pltpu.VMEM((block_c, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lab2, h, w, lse2d, g_lse2d, g_lab2d)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(v // block_v, c // block_c),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
            pl.BlockSpec((block_c, hd), lambda j, i: (i, 0)),
            pl.BlockSpec((block_v, hd), lambda j, i: (j, 0)),
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
        ],
        out_specs=pl.BlockSpec((block_v, hd), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((v, hd), w.dtype),
        scratch_shapes=[pltpu.VMEM((block_v, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lab2, h, w, lse2d, g_lse2d, g_lab2d)

    if v_limit is not None and v_limit < v_orig:
        # tail rows get their grads from the caller's XLA tail path; the pad
        # is a transient that fuses into the grad accumulation
        dw = jnp.pad(dw, ((0, v_orig - v_limit), (0, 0)))
    else:
        dw = dw[:v_orig]  # drop padded vocab rows
    return dh, dw.astype(w.dtype), None


ce_lse_and_label_vh.defvjp(_ce_fwd, _ce_bwd)


def ce_stats_vh(h, w_vh, labels, interpret=None):
    """CE statistics over a vocab-major weight, splitting a non-tile-aligned
    vocab into [kernel over the aligned prefix] + [XLA over the ragged tail],
    merged with logaddexp OUTSIDE the custom VJP (autodiff routes the
    cotangents, so gradients stay exact and no pad copy of w exists).

    Vocabularies smaller than one tile pad (tiny copy) instead of splitting.
    """
    v = w_vh.shape[0]
    v0 = (v // PAD_MULT) * PAD_MULT
    if v % PAD_MULT == 0 or v0 == 0:
        # aligned (no mask work) or tiny (pad is cheap): pure kernel path
        return ce_lse_and_label_vh(h, w_vh, labels, interpret)

    lab_main = jnp.minimum(labels, v0 - 1)  # clamped rows get zero g_lab
    # v_limit: the kernel grid stops at v0 — no slice copy of w_vh
    lse_m, lab_m = ce_lse_and_label_vh(h, w_vh, lab_main, interpret, v0)

    @jax.checkpoint
    def tail(h, w_tail):
        logits_t = jax.lax.dot_general(h, w_tail, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        lse_t = jax.nn.logsumexp(logits_t, axis=-1)
        lab_rel = jnp.clip(labels - v0, 0, v - v0 - 1)
        lab_t = jnp.take_along_axis(logits_t, lab_rel[:, None], axis=1)[:, 0]
        return lse_t, lab_t

    lse_t, lab_t = tail(h, w_vh[v0:])
    lse = jnp.logaddexp(lse_m, lse_t)
    lab = jnp.where(labels >= v0, lab_t, lab_m)
    return lse, lab


def ce_lse_and_label(h, w, labels, interpret=None):
    """Compat wrapper over ce_stats_vh for callers holding (H, V) weights.
    For the tied-embedding path the model-side `.T` and this `.T` cancel
    under XLA, so no transpose copy is materialized."""
    return ce_stats_vh(h, w.T, labels, interpret)
