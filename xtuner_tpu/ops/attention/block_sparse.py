"""Block-sparse flash attention with prefetched block indices (DSA kernel).

Reference: xtuner/v1/ops/sparse_mla/ — TileLang kernels that gather each
query's top-k selected KEY TOKENS from HBM. A per-token HBM gather has no
efficient TPU analog (the DMA engine moves tiles, not rows), so the
TPU-native redesign quantizes the selection to KEY BLOCKS, the same move
splash-attention makes for its sparsity masks: per q-block, the indexer's
scores are pooled per k-block and the top-S blocks are selected; the kernel
then runs a flash sweep over ONLY the selected blocks, with the block ids
scalar-prefetched so the k/v DMAs are issued directly from the selection
table (pltpu.PrefetchScalarGridSpec).

Compute/DMA drop from O(L^2) to O(L * S * block) like the reference's
token-level kernel; selection granularity is the only semantic difference
(documented in docs/parity.md).

Backward: dq accumulates per q-block in VMEM over its selected blocks.
dk/dv contributions are written to UNIQUE per-(q-block, slot) partial blocks
(no in-kernel cross-step accumulation: revisiting the same HBM block from
nearby grid steps through an aliased input is a read-after-write hazard when
the input pipeline skips refetching an unchanged index) and scatter-added
into (B, Hkv, L, D) outside the kernel by XLA. The partial buffer costs
O(L * S * D) per head — the same footprint the token-gather itself has.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash import LOG2E, LN2, NEG_INF, BIG_LSE, _tile_mask


def select_key_blocks(scores, block: int, num_sel: int, causal: bool = True):
    """Pool token-level indexer scores to blocks and pick top-S per q-block.

    scores: (B, L, L) indexer scores (-inf masked). Returns
    (block_idx (B, nq, S) int32 sorted ascending, -1 = unused slot).
    """
    b, l, _ = scores.shape
    nq = l // block
    nk = l // block
    pooled = scores.reshape(b, nq, block, nk, block)
    pooled = jnp.max(jnp.where(jnp.isfinite(pooled), pooled, -jnp.inf), axis=(2, 4))
    return select_from_blockmax(pooled, num_sel, causal=causal)


def select_from_blockmax(pooled, num_sel: int, causal: bool = True):
    """Top-S key blocks per q-block from (B, nq, nk) block-max scores (the
    chunked ops/sparse_mla.indexer_block_stats output — no (B, L, L) ever
    materialized)."""
    b, nq, nk = pooled.shape
    if causal:  # a q-block may only see k-blocks at or before it
        qb = jnp.arange(nq)[:, None]
        kb = jnp.arange(nk)[None, :]
        pooled = jnp.where(kb <= qb, pooled, -jnp.inf)
    s = min(num_sel, nk)
    top, idx = jax.lax.top_k(pooled, s)  # (B, nq, S)
    idx = jnp.where(jnp.isfinite(top), idx, -1)
    idx = jnp.sort(idx, axis=-1)  # ascending; -1 slots first
    if s < num_sel:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (num_sel - s, 0)), constant_values=-1)
    return idx.astype(jnp.int32)


def _fwd_kernel(idx_ref, qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                slot_lse_ref, m_scr, l_scr, acc_scr, *, scale, causal, block, num_sel):
    b, i, h, s = (pl.program_id(x) for x in range(4))

    @pl.when(s == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    j = idx_ref[b, i, s]
    valid_slot = j >= 0
    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    run = valid_slot & seg_needed

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        sc = jax.lax.dot_general(qs, k_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qpos = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        kpos = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        mask = _tile_mask(qpos, kpos, qseg, kseg, causal, None)
        sc = jnp.where(mask, sc, NEG_INF)
        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(sc - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        sum_p = jnp.sum(p, axis=1)
        l_new = l_scr[:, 0] * alpha + sum_p
        acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)
        # per-slot base-2 log attention mass (frame-corrected by m_new):
        # mass over this k-block = exp2(slot_lse - final lse2)
        slot_lse_ref[0, 0, :, 0] = m_new + jnp.log2(jnp.maximum(sum_p, 1e-37))

    @pl.when(~run)
    def _skip():
        slot_lse_ref[0, 0, :, 0] = jnp.full((block,), -BIG_LSE, jnp.float32)

    @pl.when(s == num_sel - 1)
    def _finalize():
        l_total = l_scr[:, 0]
        valid = l_total > 0
        o_ref[0, 0] = jnp.where(
            valid[:, None], acc_scr[:] / jnp.maximum(l_total, 1e-37)[:, None], 0.0
        ).astype(o_ref.dtype)
        lse = jnp.where(valid, (m_scr[:, 0] + jnp.log2(jnp.maximum(l_total, 1e-37))) * LN2,
                        BIG_LSE)
        lse_ref[0, h] = lse


def _bwd_kernel(idx_ref, qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                delta_ref, dq_ref, dk_ref, dv_ref, dq_scr,
                *, scale, causal, block, num_sel, ratio):
    b, i, h, s = (pl.program_id(x) for x in range(4))

    @pl.when(s == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    j = idx_ref[b, i, s]
    valid_slot = j >= 0
    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    run = valid_slot & seg_needed

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        sc = jax.lax.dot_general(qs, k_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p = jnp.exp2(sc - (lse_ref[0, h] * LOG2E)[:, None])
        qpos = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        kpos = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        mask = _tile_mask(qpos, kpos, qseg, kseg, causal, None)
        p = jnp.where(mask, p, 0.0)
        do = do_ref[0, 0]
        dv_ref[0, 0, 0] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vs = v_ref[0, 0] * jnp.asarray(scale, v_ref.dtype)
        dp_s = jax.lax.dot_general(do, vs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds = (p * (dp_s - (delta_ref[0, h] * scale)[:, None])).astype(q.dtype)
        dk_ref[0, 0, 0] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq_scr[:] += jax.lax.dot_general(ds, k_ref[0, 0], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(~run)
    def _zero_slot():
        dk_ref[0, 0, 0] = jnp.zeros_like(dk_ref[0, 0, 0])
        dv_ref[0, 0, 0] = jnp.zeros_like(dv_ref[0, 0, 0])

    @pl.when(s == num_sel - 1)
    def _finalize():
        # ds already carries the grad scale (folded into the v tile)
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _specs(block, d, dv, hq, ratio, num_sel):
    # index maps receive (*grid_indices, *scalar_prefetch_refs)
    def clamp(idx_ref, b, i, s):
        return jnp.maximum(idx_ref[b, i, s], 0)

    qspec = pl.BlockSpec((1, 1, block, d), lambda b, i, h, s, idx: (b, h, i, 0))
    kspec = pl.BlockSpec((1, 1, block, d),
                         lambda b, i, h, s, idx: (b, h // ratio, clamp(idx, b, i, s), 0))
    vspec = pl.BlockSpec((1, 1, block, dv),
                         lambda b, i, h, s, idx: (b, h // ratio, clamp(idx, b, i, s), 0))
    qseg = pl.BlockSpec((1, 1, block), lambda b, i, h, s, idx: (b, 0, i))
    kseg = pl.BlockSpec((1, 1, block),
                        lambda b, i, h, s, idx: (b, 0, clamp(idx, b, i, s)))
    row = pl.BlockSpec((1, hq, block), lambda b, i, h, s, idx: (b, 0, i))
    return qspec, kspec, vspec, qseg, kseg, row


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _bs_attn(q, k, v, block_idx, segment_ids, scale, causal, block, interpret):
    (out, mass), _ = _bs_fwd(q, k, v, block_idx, segment_ids, scale, causal, block,
                             interpret)
    return out, mass


def _bs_fwd(q, k, v, block_idx, segment_ids, scale, causal, block, interpret):
    b, hq, l, d = q.shape
    hkv = k.shape[1]
    dv = v.shape[-1]
    ratio = hq // hkv
    nq = l // block
    num_sel = block_idx.shape[-1]
    qspec, kspec, vspec, qsegs, ksegs, row = _specs(block, d, dv, hq, ratio, num_sel)
    seg3 = segment_ids[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq, hq, num_sel),
        in_specs=[qsegs, ksegs, qspec, kspec, vspec],
        out_specs=[
            pl.BlockSpec((1, 1, block, dv), lambda b_, i, h, s, idx: (b_, h, i, 0)),
            row,
            pl.BlockSpec((1, 1, block, 1), lambda b_, i, h, s, idx: (b_, h, i, s)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, dv), jnp.float32),
        ],
    )
    out, lse, slot_lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal, block=block,
                          num_sel=num_sel),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, l, dv), q.dtype),
            jax.ShapeDtypeStruct((b, hq, l), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, l, num_sel), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_idx, seg3, seg3, q, k, v)
    # per-slot attention mass, normalized by the final lse (base-2 frames)
    mass = jnp.exp2(slot_lse - (lse * LOG2E)[..., None])
    return (out, mass), (q, k, v, block_idx, segment_ids, out, lse)


def _bs_bwd(scale, causal, block, interpret, res, gs):
    g, _ = gs  # mass output carries no gradient (distillation target is stop-grad)
    q, k, v, block_idx, segment_ids, out, lse = res
    b, hq, l, d = q.shape
    hkv = k.shape[1]
    dv = v.shape[-1]
    ratio = hq // hkv
    nq = l // block
    num_sel = block_idx.shape[-1]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    seg3 = segment_ids[:, None, :]
    qspec, kspec, vspec, qsegs, ksegs, row = _specs(block, d, dv, hq, ratio, num_sel)
    # dk/dv partials: one unique slot block per (q-block, selection slot)
    dk_part_spec = pl.BlockSpec(
        (1, 1, 1, block, d), lambda b_, i, h, s, idx: (b_, h, i * num_sel + s, 0, 0))
    dv_part_spec = pl.BlockSpec(
        (1, 1, 1, block, dv), lambda b_, i, h, s, idx: (b_, h, i * num_sel + s, 0, 0))
    dospec = pl.BlockSpec((1, 1, block, dv), lambda b_, i, h, s, idx: (b_, h, i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq, hq, num_sel),
        in_specs=[qsegs, ksegs, qspec, kspec, vspec, dospec, row, row],
        out_specs=[
            pl.BlockSpec((1, 1, block, d), lambda b_, i, h, s, idx: (b_, h, i, 0)),
            dk_part_spec,
            dv_part_spec,
        ],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
    )
    dq, dk_part, dv_part = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal, block=block,
                          num_sel=num_sel, ratio=ratio),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, nq * num_sel, block, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, nq * num_sel, block, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_idx, seg3, seg3, q, k, v, g, lse, delta)
    # scatter-add slot partials into per-kv-head block rows (XLA scatter);
    # invalid slots (-1) routed to a trash block nk
    nk = l // block
    flat_idx = jnp.where(block_idx >= 0, block_idx, nk).reshape(b, nq * num_sel)
    dk_blocks = jnp.zeros((b, hq, nk + 1, block, d), jnp.float32)
    dv_blocks = jnp.zeros((b, hq, nk + 1, block, dv), jnp.float32)
    bi = jnp.arange(b)[:, None]
    dk_blocks = dk_blocks.at[bi, :, flat_idx].add(jnp.swapaxes(dk_part, 1, 2))
    dv_blocks = dv_blocks.at[bi, :, flat_idx].add(jnp.swapaxes(dv_part, 1, 2))
    dk_h = dk_blocks[:, :, :nk].reshape(b, hq, l, d)
    dv_h = dv_blocks[:, :, :nk].reshape(b, hq, l, dv)
    if ratio > 1:
        dk = dk_h.reshape(b, hkv, ratio, l, d).sum(axis=2).astype(k.dtype)
        dvo = dv_h.reshape(b, hkv, ratio, l, dv).sum(axis=2).astype(v.dtype)
    else:
        dk, dvo = dk_h.astype(k.dtype), dv_h.astype(v.dtype)
    return dq, dk, dvo, None, None


_bs_attn.defvjp(_bs_fwd, _bs_bwd)


def block_sparse_attention(q, k, v, block_idx, segment_ids, *, scale=None,
                           causal: bool = True, block: int = 256,
                           return_block_mass: bool = False, interpret=None):
    """q: (B, L, Hq, D); k/v: (B, L, Hkv, D); block_idx: (B, L//block, S)
    ascending k-block ids per q-block (-1 = unused). Returns (B, L, Hq, Dv);
    with return_block_mass also (B, L, Hq, S) per-slot attention mass
    (stop-gradient; the block-level indexer distillation target).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, l, hq, d = q.shape
    if l % block:
        raise ValueError(f"L ({l}) must be a multiple of block ({block})")
    scale = scale if scale is not None else d ** -0.5
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out, mass = _bs_attn(qt, kt, vt, block_idx, segment_ids, scale, causal, block,
                         interpret)
    out = jnp.swapaxes(out, 1, 2)
    if return_block_mass:
        return out, jnp.swapaxes(mass, 1, 2)
    return out
