"""Fused chunk-free cross-entropy statistics (liger-kernel analog).

Reference: xtuner/v1/loss/ce_loss.py `CELossConfig(mode="liger")` — a fused
kernel that never materializes the (tokens, vocab) logits. The XLA chunked
path (loss/ce_loss.py mode="chunk") still writes each (chunk, vocab) f32
logits block to HBM between fusions (~6 passes of ~1.3 GB per 2k-token chunk
at 152k vocab — the dominant CE cost in the 64k step profile). This Pallas
kernel sweeps vocab TILES with the logits resident in VMEM only, computing
the two per-row statistics CE needs:

    lse[r]         = logsumexp_v(h[r] . w[:, v])
    label_logit[r] = h[r] . w[:, labels[r]]

`ce = lse - label_logit` and any weighting/reduction compose outside in jnp;
the custom VJP receives the (g_lse, g_label) cotangents, so the op is usable
for CE loss AND per-token logprobs. Backward recomputes the logits tile-wise
(two sweeps: dh with the tile resident per q-block, dw with it resident per
vocab-block); the label columns' rank-1 terms are applied OUTSIDE the kernel
as one XLA gather (dh) and one scatter-add (dw).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention.flash import LN2, LOG2E, NEG_INF


def _fwd_kernel(lab_ref, h_ref, w_ref, lse_ref, lablogit_ref, m_scr, l_scr, lab_scr,
                *, block_c, block_v, v_real):
    i, j = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        lab_scr[:] = jnp.zeros_like(lab_scr)

    logits = jax.lax.dot_general(h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
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


def _dh_kernel(lab_ref, h_ref, w_ref, lse_ref, g_lse_ref, dh_ref, dh_scr,
               *, block_c, block_v, v_real):
    i, j = pl.program_id(0), pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    w = w_ref[...]
    logits = jax.lax.dot_general(h_ref[...], w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if v_real is not None:
        cols_g = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
        logits = jnp.where(cols_g < v_real, logits, NEG_INF)
    p = jnp.exp2(logits * LOG2E - (lse_ref[0, :] * LOG2E)[:, None])
    ps = (p * g_lse_ref[0, :][:, None]).astype(w.dtype)
    dh_scr[:] += jax.lax.dot_general(ps, w, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(j == nv - 1)
    def _finalize():
        dh_ref[...] = dh_scr[:].astype(dh_ref.dtype)


def _dw_kernel(lab_ref, h_ref, w_ref, lse_ref, g_lse_ref, dw_ref, dw_scr,
               *, block_c, block_v, v_real):
    j, i = pl.program_id(0), pl.program_id(1)  # vocab-tile outer, rows inner
    nc = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    h = h_ref[...]
    logits = jax.lax.dot_general(h, w_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if v_real is not None:
        cols_g = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_c, block_v), 1)
        logits = jnp.where(cols_g < v_real, logits, NEG_INF)
    p = jnp.exp2(logits * LOG2E - (lse_ref[0, :] * LOG2E)[:, None])
    ps = (p * g_lse_ref[0, :][:, None]).astype(h.dtype)
    dw_scr[:] += jax.lax.dot_general(h, ps, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(i == nc - 1)
    def _finalize():
        dw_ref[...] = dw_scr[:].astype(dw_ref.dtype)


def _pick_blocks(c, v):
    block_c = 512 if c % 512 == 0 else max(b for b in (256, 128, 64, 32, 16, 8)
                                           if c % b == 0)
    block_v = 2048  # vocab padded up to a multiple; kernel masks the tail
    return block_c, block_v


def _pad_vocab(w, block_v):
    v = w.shape[1]
    pad = (block_v - v % block_v) % block_v
    if pad:
        return jnp.pad(w, ((0, 0), (0, pad))), v
    return w, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ce_lse_and_label(h, w, labels, interpret=None):
    """h: (C, H) compute dtype; w: (H, V); labels: (C,) int32 IN [0, V).
    Returns (lse (C,) f32, label_logit (C,) f32). Ignore-index rows must be
    pre-clamped to a valid id and masked by the caller."""
    out, _ = _ce_fwd(h, w, labels, interpret)
    return out


def _run_fwd(h, w, labels, interpret):
    c, hd = h.shape
    block_c, block_v = _pick_blocks(c, w.shape[1])
    w, v_real = _pad_vocab(w, block_v)
    v = w.shape[1]
    lab2 = labels.reshape(1, c).astype(jnp.int32)
    lse, lab_logit = pl.pallas_call(
        functools.partial(_fwd_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(c // block_c, v // block_v),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),  # labels
            pl.BlockSpec((block_c, hd), lambda i, j: (i, 0)),
            pl.BlockSpec((hd, block_v), lambda i, j: (0, j)),
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


def _ce_fwd(h, w, labels, interpret):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lse, lab_logit = _run_fwd(h, w, labels, interpret)
    return (lse, lab_logit), (h, w, labels, lse)


def _ce_bwd(interpret, res, gs):
    g_lse, g_lab = gs
    h, w, labels, lse = res
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    c, hd = h.shape
    block_c, block_v = _pick_blocks(c, w.shape[1])
    # backward holds logits + p + ps + the dh/dw scratch at once: halve both
    # tile dims to stay inside the 16MB scoped-vmem budget
    block_v = min(block_v, 1024)
    block_c = min(block_c, 256)
    v_orig = w.shape[1]
    w, v_real = _pad_vocab(w, block_v)
    v = w.shape[1]
    lab2 = labels.reshape(1, c).astype(jnp.int32)
    g_lse = g_lse.astype(jnp.float32)
    g_lab = g_lab.astype(jnp.float32)
    lse2d = lse.reshape(1, c)
    g_lse2d = g_lse.reshape(1, c)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(c // block_c, v // block_v),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda i, j: (0, i)),
            pl.BlockSpec((block_c, hd), lambda i, j: (i, 0)),
            pl.BlockSpec((hd, block_v), lambda i, j: (0, j)),
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
    )(lab2, h, w, lse2d, g_lse2d)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, block_c=block_c, block_v=block_v,
                          v_real=v_real),
        grid=(v // block_v, c // block_c),
        in_specs=[
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
            pl.BlockSpec((block_c, hd), lambda j, i: (i, 0)),
            pl.BlockSpec((hd, block_v), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
            pl.BlockSpec((1, block_c), lambda j, i: (0, i)),
        ],
        out_specs=pl.BlockSpec((hd, block_v), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((hd, v), w.dtype),
        scratch_shapes=[pltpu.VMEM((hd, block_v), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lab2, h, w, lse2d, g_lse2d)

    # rank-1 label terms, applied with ONE gather / ONE scatter outside the
    # kernels: d(label_logit[r])/dh[r] = w[:, labels[r]],
    #          d(label_logit[r])/dw[:, labels[r]] = h[r]
    wl = jnp.take(w, labels, axis=1).T.astype(jnp.float32)  # (C, H)
    dh = dh.astype(jnp.float32) + g_lab[:, None] * wl
    dw_label = jnp.zeros((v, hd), jnp.float32).at[labels].add(
        h.astype(jnp.float32) * g_lab[:, None])
    dw = dw.astype(jnp.float32) + dw_label.T
    dw = dw[:, :v_orig]  # drop padded vocab columns
    return dh.astype(h.dtype), dw.astype(w.dtype), None


ce_lse_and_label.defvjp(_ce_fwd, _ce_bwd)
