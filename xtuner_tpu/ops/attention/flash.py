"""Pallas TPU flash attention for packed varlen sequences.

The TPU replacement for the reference's flash-attn 2/3 CUDA wrappers
(xtuner/v1/ops/flash_attn/gpu.py) and the Triton sink kernel
(flash_sink_varlen_attn_gpt_oss.py). Design:

- Packed documents are expressed with *segment ids* (non-decreasing along the
  row, 0 = padding); the mask (seg_q == seg_k) & causal & valid is evaluated
  per (q-block, k-block) tile — the block-diagonal structure the reference
  builds from cu_seqlens.
- Online softmax with fp32 running max/denominator scratch; bf16 inputs hit
  the MXU, accumulation in fp32.
- Causality prunes both compute and DMA: the k-block index map clamps j to i,
  so skipped tiles re-reference an already-resident block (no new fetch),
  and `pl.when` skips their compute. Segment structure additionally skips
  compute of cross-document tiles.
- GQA is folded into the index maps (q head h reads kv head h // ratio); kv
  tensors are never materially repeated.
- Sliding window and GPT-OSS attention sinks supported; sinks receive exact
  gradients via the saved logsumexp (computed outside the kernel).
- Backward = two flash kernels (dq over q-blocks; dk/dv over k-blocks with
  per-q-head outputs group-summed outside), using saved (out, lse) residuals.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BIG_LSE = 1e30  # lse sentinel for fully-masked (padding) rows
LOG2E = 1.4426950408889634  # kernels work in base-2 (exp2 is the TPU-native
LN2 = 0.6931471805599453  # transcendental; exp costs an extra multiply/elem)
# backward = dq kernel + GQA-grouped dkv kernel (dk/dv accumulate across the
# whole q-head group in VMEM — no per-q-head (B, Hq, L, D) dk/dv temps).
# XTUNER_ATTN_BWD=two_pass falls back to the per-q-head dkv kernel.
# NOTE the round-4 "fused single-sweep" backward (dq accumulated in HBM via
# input_output_aliases across non-consecutive grid revisits) was REMOVED:
# Pallas does not order an aliased input block's fetch after a prior grid
# step's write-back (each step reads the original buffer in interpret mode,
# and nothing guarantees the DMA ordering on hardware), so its dq silently
# dropped every contribution but the last k-block's. Do not reintroduce
# cross-grid-step aliased accumulation.
ATTN_BWD = os.environ.get("XTUNER_ATTN_BWD", "grouped")
# |scaled logit| bound below which the max-free forward kernel is numerically
# safe: exp2(s * log2e) stays inside f32 range (overflow 2^127, denormal
# 2^-149) for |s| <= 45, with headroom for the row sum
MAX_FREE_BOUND = 45.0


def _tile_mask(qpos, kpos, qseg, kseg, causal: bool, window: Optional[int]):
    """(bq, bk) boolean mask for one tile. qpos/kpos (bq,)/(bk,) int32."""
    mask = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] != 0)
    if causal:
        mask &= qpos[:, None] >= kpos[None, :]
    if window is not None:
        mask &= (qpos[:, None] - kpos[None, :]) < window
    return mask


def _tile_full(i, j, qseg, kseg, causal, window, block_q, block_k):
    """Scalar predicate: EVERY (q, k) pair in this tile is visible, so the
    mask (iota + compares + selects) can be skipped entirely. At 64k/block
    1024 the diagonal+boundary tiles are ~3% of work — the other 97% take the
    fast path (splash-attention-style full-tile specialization)."""
    qmin, qmax = jnp.min(qseg), jnp.max(qseg)
    kmin, kmax = jnp.min(kseg), jnp.max(kseg)
    full = (qmin == qmax) & (kmin == kmax) & (qmax == kmax) & (qmin > 0)
    if causal:
        full &= i * block_q >= j * block_k + block_k - 1  # min qpos >= max kpos
    if window is not None:
        full &= (i * block_q + block_q - 1) - j * block_k < window
    return full


def _fwd_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, causal, window,
                block_q, block_k, max_free, sub_k):
    # grid order (b, i, h, j): heads iterate *inside* a q-block so the
    # full-head lse output block stays resident until all head rows are written
    #
    # max_free: the scaled logits are guaranteed in [-MAX_FREE_BOUND,
    # MAX_FREE_BOUND] (provable for qk-normed models), so exp2 of the raw
    # logits stays inside f32 range and the online-softmax max tracking —
    # the row max reduce, the alpha rescale of acc, the m scratch — is
    # skipped entirely. Softmax is shift-invariant, so the result is exact.
    b, i, h, j = (pl.program_id(x) for x in range(4))
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        if not max_free:
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    # block-level skip: causal (j beyond i) and segment disjointness.
    causal_needed = (j * block_k <= i * block_q + block_q - 1) if causal else True
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    needed = causal_needed & seg_needed
    full = _tile_full(i, j, qseg, kseg, causal, window, block_q, block_k)

    def compute_max_free(use_mask: bool):
        # max-free path with the k block processed in unrolled sub-blocks:
        # sub-iterations are fully independent (no running max), so Mosaic
        # interleaves sub-block t+1's QK matmul with sub-block t's exp2/sum
        # VPU work instead of serializing MXU and VPU per tile
        q = q_ref[0, 0]
        # scale * log2(e) folded into the (block_q, d) q tile — one small
        # multiply instead of a (block_q, block_k) one on s
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        if use_mask:
            qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
        l_add = jnp.zeros((block_q,), jnp.float32)
        for t in range(block_k // sub_k):
            sl = slice(t * sub_k, (t + 1) * sub_k)
            s = jax.lax.dot_general(qs, k_ref[0, 0, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = jnp.exp2(s)
            if use_mask:
                kpos = (j * block_k + t * sub_k
                        + jax.lax.broadcasted_iota(jnp.int32, (sub_k, 1), 0)[:, 0])
                p = jnp.where(_tile_mask(qpos, kpos, qseg, kseg[sl], causal, window), p, 0.0)
            l_add = l_add + jnp.sum(p, axis=1)
            acc_scr[:] += jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        l_scr[:] = jnp.broadcast_to((l_scr[:, 0] + l_add)[:, None], l_scr.shape)

    def compute(use_mask: bool):
        if max_free:
            compute_max_free(use_mask)
            return
        # running-max path, sub-blocked the classic online-softmax way so an
        # oversized k tile (block_k > block_q, see XTUNER_FLASH_BLOCK_K) never
        # materializes a (block_q, block_k) f32 logits tile in VMEM
        q = q_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        if use_mask:
            qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
        for t in range(block_k // sub_k):
            sl = slice(t * sub_k, (t + 1) * sub_k)
            s = jax.lax.dot_general(qs, k_ref[0, 0, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if use_mask:
                kpos = (j * block_k + t * sub_k
                        + jax.lax.broadcasted_iota(jnp.int32, (sub_k, 1), 0)[:, 0])
                mask = _tile_mask(qpos, kpos, qseg, kseg[sl], causal, window)
                s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[:, 0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new[:, None])
            if use_mask:
                # fully-masked rows have m_new == NEG_INF -> exp(NaN); zero them
                p = jnp.where(mask, p, 0.0)
            l_new = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
            acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
            l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(needed & full)
    def _compute_full():
        compute(use_mask=False)

    @pl.when(needed & ~full)
    def _compute_masked():
        compute(use_mask=True)

    @pl.when(j == nk - 1)
    def _finalize():
        l_total = l_scr[:, 0]
        valid = l_total > 0
        o_ref[0, 0] = jnp.where(
            valid[:, None], acc_scr[:] / jnp.maximum(l_total, 1e-37)[:, None], 0.0
        ).astype(o_ref.dtype)
        # lse returned in natural base (consumers: sinks fold, backward)
        log2l = jnp.log2(jnp.maximum(l_total, 1e-37))
        if max_free:
            lse = jnp.where(valid, log2l * LN2, BIG_LSE)
        else:
            lse = jnp.where(valid, (m_scr[:, 0] + log2l) * LN2, BIG_LSE)
        lse_ref[0, h] = lse


def _dq_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale, causal, window, block_q, block_k):
    b, h, i, j = (pl.program_id(x) for x in range(4))
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    causal_needed = (j * block_k <= i * block_q + block_q - 1) if causal else True
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    needed = causal_needed & seg_needed
    full = _tile_full(i, j, qseg, kseg, causal, window, block_q, block_k)

    def compute(use_mask: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # lse of padding rows is BIG_LSE -> exp(s - BIG_LSE) == 0, so the
        # full path needs no row masking
        p = jnp.exp2(s - (lse_ref[0, h] * LOG2E)[:, None])
        if use_mask:
            qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
            kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)[:, 0]
            mask = _tile_mask(qpos, kpos, qseg, kseg, causal, window)
            p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, h][:, None])  # grad scale deferred to finalize
        dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(needed & full)
    def _compute_full():
        compute(use_mask=False)

    @pl.when(needed & ~full)
    def _compute_masked():
        compute(use_mask=True)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal, window,
                block_q, block_k):
    b, h, j, i = (pl.program_id(x) for x in range(4))  # note: kv block j outer, q block i inner
    nq = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    causal_needed = (i * block_q + block_q - 1 >= j * block_k) if causal else True
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    needed = causal_needed & seg_needed
    full = _tile_full(i, j, qseg, kseg, causal, window, block_q, block_k)

    def compute(use_mask: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - (lse_ref[0, h] * LOG2E)[:, None])
        if use_mask:
            qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
            kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)[:, 0]
            mask = _tile_mask(qpos, kpos, qseg, kseg, causal, window)
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0, 0]
        dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, h][:, None])  # grad scale deferred to finalize
        dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(needed & full)
    def _compute_full():
        compute(use_mask=False)

    @pl.when(needed & ~full)
    def _compute_masked():
        compute(use_mask=True)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _dkv_grouped_kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                        delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale,
                        causal, window, block_q, block_k, ratio):
    """GQA-grouped dk/dv: grid (b, hkv, j, g, i) with kv-block j held fixed
    while the WHOLE q-head group (g) and q range (i) sweep, so dk/dv
    accumulate in VMEM scratch and are written once per kv head — no
    per-q-head (B, Hq, L, D) dk_h/dv_h temps and no group-sum afterwards
    (the two-pass kernel's ratio-times HBM blowup)."""
    b, hkv, j, g, i = (pl.program_id(x) for x in range(5))
    nq = pl.num_programs(4)
    h = hkv * ratio + g  # global q-head (lse/delta row)

    @pl.when((g == 0) & (i == 0))
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qseg = qseg_ref[0, 0]
    kseg = kseg_ref[0, 0]
    causal_needed = (i * block_q + block_q - 1 >= j * block_k) if causal else True
    seg_needed = (jnp.max(kseg) >= jnp.min(jnp.where(qseg == 0, jnp.int32(2**30), qseg))) & (
        jnp.max(qseg) > 0) & (jnp.max(kseg) > 0)
    needed = causal_needed & seg_needed
    full = _tile_full(i, j, qseg, kseg, causal, window, block_q, block_k)

    def compute(use_mask: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - (lse_ref[0, h] * LOG2E)[:, None])
        if use_mask:
            qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
            kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)[:, 0]
            mask = _tile_mask(qpos, kpos, qseg, kseg, causal, window)
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0, 0]
        dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_ref[0, h][:, None])).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(needed & full)
    def _compute_full():
        compute(use_mask=False)

    @pl.when(needed & ~full)
    def _compute_masked():
        compute(use_mask=True)

    @pl.when((g == ratio - 1) & (i == nq - 1))
    def _finalize():
        dk_ref[0, 0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _grouped_dkv(q, k, v, seg3, g, lse, delta, scale, causal, window,
                 block_q, block_k, interpret):
    b, hq, l, d = q.shape
    dv = v.shape[-1]
    hkv = k.shape[1]
    ratio = hq // hkv
    nq, nk = l // block_q, l // block_k

    def qi(i_, j_):
        # causal DMA clamp: tiles with i < j are skipped; re-reference block j
        return jnp.maximum(i_, j_) if causal else i_

    in_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, j_, g_, i_: (b_, 0, qi(i_, j_))),  # qseg
        pl.BlockSpec((1, 1, block_k), lambda b_, h_, j_, g_, i_: (b_, 0, j_)),  # kseg
        pl.BlockSpec((1, 1, block_q, d),
                     lambda b_, h_, j_, g_, i_: (b_, h_ * ratio + g_, qi(i_, j_), 0)),  # q
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j_, g_, i_: (b_, h_, j_, 0)),  # k
        pl.BlockSpec((1, 1, block_k, dv), lambda b_, h_, j_, g_, i_: (b_, h_, j_, 0)),  # v
        pl.BlockSpec((1, 1, block_q, dv),
                     lambda b_, h_, j_, g_, i_: (b_, h_ * ratio + g_, qi(i_, j_), 0)),  # do
        pl.BlockSpec((1, hq, block_q), lambda b_, h_, j_, g_, i_: (b_, 0, qi(i_, j_))),  # lse
        pl.BlockSpec((1, hq, block_q), lambda b_, h_, j_, g_, i_: (b_, 0, qi(i_, j_))),  # delta
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j_, g_, i_: (b_, h_, j_, 0)),  # dk
        pl.BlockSpec((1, 1, block_k, dv), lambda b_, h_, j_, g_, i_: (b_, h_, j_, 0)),  # dv
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, hkv, l, d), k.dtype),
        jax.ShapeDtypeStruct((b, hkv, l, dv), v.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_dkv_grouped_kernel, scale=scale, causal=causal, window=window,
                          block_q=block_q, block_k=block_k, ratio=ratio),
        grid=(b, hkv, nk, ratio, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seg3, seg3, q, k, v, g, lse, delta)


# ----------------------------------------------------------------------
# host-side wrappers
# ----------------------------------------------------------------------

def _pick_block(l: int, preferred: int) -> int:
    b = min(preferred, l)
    while l % b:
        b //= 2
    return max(b, 128) if l % max(b, 128) == 0 else b


def _pad_len(l: int, block: int) -> int:
    return (block - l % block) % block


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12)
)
def _flash(q, k, v, segment_ids, sinks, max_logit, scale, causal, window,
           block_q, block_k, interpret, block_k_fwd=0):
    out, _ = _flash_fwd_rule(q, k, v, segment_ids, sinks, max_logit, scale,
                             causal, window, block_q, block_k, interpret,
                             block_k_fwd)
    return out


def _flash_forward(q, k, v, segment_ids, sinks, max_logit, scale, causal, window,
                   block_q, block_k, interpret):
    """q: (B, Hq, L, D); k, v: (B, Hkv, L, D); segment_ids: (B, L).
    Returns (out (B, Hq, L, D), lse (B, Hq, L) fp32)."""
    b, hq, l, d = q.shape
    dv = v.shape[-1]
    hkv = k.shape[1]
    ratio = hq // hkv
    nq, nk = l // block_q, l // block_k

    seg3 = segment_ids[:, None, :]
    operands = (seg3, seg3, q, k, v)
    grid = (b, nq, hq, nk)

    # causal DMA clamp, generalized to block_k = r * block_q: the last k block
    # a q block i can need is (i*bq + bq - 1) // bk == i // r
    r = block_k // block_q

    def kj(i_, j_):
        return jnp.minimum(j_, i_ // r) if causal else j_

    in_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, i_, h_, j_: (b_, 0, i_)),  # qseg
        pl.BlockSpec((1, 1, block_k), lambda b_, i_, h_, j_: (b_, 0, j_)),  # kseg
        pl.BlockSpec((1, 1, block_q, d), lambda b_, i_, h_, j_: (b_, h_, i_, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda b_, i_, h_, j_: (b_, h_ // ratio, kj(i_, j_), 0)),
        pl.BlockSpec((1, 1, block_k, dv),
                     lambda b_, i_, h_, j_: (b_, h_ // ratio, kj(i_, j_), 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, dv), lambda b_, i_, h_, j_: (b_, h_, i_, 0)),
        pl.BlockSpec((1, hq, block_q), lambda b_, i_, h_, j_: (b_, 0, i_)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, hq, l, dv), q.dtype),
        jax.ShapeDtypeStruct((b, hq, l), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, dv), jnp.float32),
    ]

    # k sub-block size for the kernels' unrolled inner loops. Square tiles
    # default to the whole tile: measured on v5e @64k, shrinking the matmuls
    # LOSES (256: 89 TF/s, 512: 102, 1024/full: 114-140). An OVERSIZED fwd
    # tile (block_k > block_q, see flash_attention) defaults to block_q-wide
    # subs: matmul width is preserved and the sub-chains interleave.
    default_sub = block_q if block_k > block_q else block_k
    sub_k = min(int(os.environ.get("XTUNER_FLASH_SUBK", str(default_sub))), block_k)
    while block_k % sub_k:
        sub_k //= 2

    def run(max_free, ops):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, causal=causal, window=window,
                              block_q=block_q, block_k=block_k, max_free=max_free,
                              sub_k=sub_k),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*ops)

    if max_logit is None:
        out, lse = run(False, operands)
    else:
        # provable |scaled logit| bound (e.g. from qk-norm gains): when small
        # enough, run the max-free kernel — exact by shift invariance; the
        # cond compiles both variants, executes one
        out, lse = jax.lax.cond(
            jnp.asarray(max_logit, jnp.float32) <= MAX_FREE_BOUND,
            functools.partial(run, True),
            functools.partial(run, False),
            operands,
        )

    if sinks is not None:
        # fold the sink column into out/lse outside the kernel:
        # lse' = log(exp(lse) + exp(sink)); out' = out * exp(lse - lse')
        sink_b = sinks.astype(jnp.float32)[None, :, None]
        lse_new = jnp.logaddexp(lse, sink_b)
        out = (out.astype(jnp.float32) * jnp.exp(lse - lse_new)[..., None]).astype(out.dtype)
        lse = lse_new
    return out, lse


def _flash_fwd_rule(q, k, v, segment_ids, sinks, max_logit, scale, causal, window,
                    block_q, block_k, interpret, block_k_fwd=0):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _flash_forward(q, k, v, segment_ids, sinks, max_logit, scale,
                              causal, window, block_q, block_k_fwd or block_k,
                              interpret)
    # named so remat policies can SAVE the kernel residuals — without these,
    # rematerialisation re-runs the forward flash kernel inside backward
    out = checkpoint_name(out, "attn_res_out")
    lse = checkpoint_name(lse, "attn_lse")
    q = checkpoint_name(q, "attn_q")
    k = checkpoint_name(k, "attn_k")
    v = checkpoint_name(v, "attn_v")
    return out, (q, k, v, segment_ids, sinks, out, lse)


def _flash_bwd_rule(scale, causal, window, block_q, block_k, interpret,
                    block_k_fwd, res, g):
    q, k, v, segment_ids, sinks, out, lse = res
    b, hq, l, d = q.shape
    dv = v.shape[-1]
    hkv = k.shape[1]
    ratio = hq // hkv
    nq, nk = l // block_q, l // block_k

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,Hq,L)
    seg3 = segment_ids[:, None, :]

    common_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i_, j_: (b_, 0, i_)),  # qseg
        pl.BlockSpec((1, 1, block_k), lambda b_, h_, i_, j_: (b_, 0, j_)),  # kseg
    ]

    # ---- dq ----
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal, window=window,
                          block_q=block_q, block_k=block_k),
        grid=(b, hq, nq, nk),
        in_specs=common_specs + [
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i_, j_: (b_, h_, i_, 0)),  # q
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i_, j_: (b_, h_ // ratio, jnp.minimum(j_, i_) if causal else j_, 0)),  # k
            pl.BlockSpec((1, 1, block_k, dv),
                         lambda b_, h_, i_, j_: (b_, h_ // ratio, jnp.minimum(j_, i_) if causal else j_, 0)),  # v
            pl.BlockSpec((1, 1, block_q, dv), lambda b_, h_, i_, j_: (b_, h_, i_, 0)),  # do
            pl.BlockSpec((1, hq, block_q), lambda b_, h_, i_, j_: (b_, 0, i_)),  # lse
            pl.BlockSpec((1, hq, block_q), lambda b_, h_, i_, j_: (b_, 0, i_)),  # delta
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i_, j_: (b_, h_, i_, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, l, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seg3, seg3, q, k, v, g, lse, delta)

    # ---- dk / dv ----
    if ATTN_BWD == "grouped":
        dk_out, dv_out = _grouped_dkv(q, k, v, seg3, g, lse, delta, scale,
                                      causal, window, block_q, block_k, interpret)
        if sinks is not None:
            p_sink = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse)
            dsinks = -(p_sink * delta).sum(axis=(0, 2)).astype(sinks.dtype)
        else:
            dsinks = None
        return dq, dk_out, dv_out, None, dsinks, None

    # two-pass fallback: per q-head dk/dv, group-summed afterwards
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal, window=window,
                          block_q=block_q, block_k=block_k),
        grid=(b, hq, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b_, h_, j_, i_: (b_, 0, i_)),  # qseg
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, j_, i_: (b_, 0, j_)),  # kseg
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, j_, i_: (b_, h_, jnp.maximum(i_, j_) if causal else i_, 0)),  # q
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j_, i_: (b_, h_ // ratio, j_, 0)),  # k
            pl.BlockSpec((1, 1, block_k, dv), lambda b_, h_, j_, i_: (b_, h_ // ratio, j_, 0)),  # v
            pl.BlockSpec((1, 1, block_q, dv),
                         lambda b_, h_, j_, i_: (b_, h_, jnp.maximum(i_, j_) if causal else i_, 0)),  # do
            pl.BlockSpec((1, hq, block_q),
                         lambda b_, h_, j_, i_: (b_, 0, jnp.maximum(i_, j_) if causal else i_)),  # lse
            pl.BlockSpec((1, hq, block_q),
                         lambda b_, h_, j_, i_: (b_, 0, jnp.maximum(i_, j_) if causal else i_)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j_, i_: (b_, h_, j_, 0)),
            pl.BlockSpec((1, 1, block_k, dv), lambda b_, h_, j_, i_: (b_, h_, j_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, l, dv), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seg3, seg3, q, k, v, g, lse, delta)

    if ratio > 1:
        dk_out = dk_h.reshape(b, hkv, ratio, l, d).sum(axis=2).astype(k.dtype)
        dv_out = dv_h.reshape(b, hkv, ratio, l, dv).sum(axis=2).astype(v.dtype)
    else:
        dk_out, dv_out = dk_h.astype(k.dtype), dv_h.astype(v.dtype)

    if sinks is not None:
        # ds_sink = -p_sink * delta summed over batch and rows
        p_sink = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse)  # (B,Hq,L)
        dsinks = -(p_sink * delta).sum(axis=(0, 2)).astype(sinks.dtype)
    else:
        dsinks = None
    return dq, dk_out, dv_out, None, dsinks, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, segment_ids, *, causal: bool = True,
                    scale: Optional[float] = None, window: Optional[int] = None,
                    sinks=None, max_logit=None, block_q: int = 1024, block_k: int = 1024,
                    interpret: Optional[bool] = None):
    """Public entry. q: (B, L, Hq, D); k, v: (B, L, Hkv, D); seg: (B, L).

    max_logit: optional traced f32 scalar — a PROVEN upper bound on the
    absolute value of the scaled logits (e.g. sqrt(d)*max|g_q|*max|g_k| for
    qk-normed heads). When <= MAX_FREE_BOUND the forward runs the max-free
    kernel (no running-max tracking); exact either way.

    Returns (B, L, Hq, D) in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, l, hq, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    # the bwd kernels' q<->kv DMA clamps require block_q == block_k
    block = _pick_block(l, min(block_q, block_k))
    pad = _pad_len(l, block)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        segment_ids = jnp.pad(segment_ids, ((0, 0), (0, pad)))
        block = _pick_block(l + pad, block)
    block_q = block_k = block

    # FORWARD-only oversized k tile (block_k_fwd = r * block_q): with the
    # max-free path's sub-block loop (sub_k = block_q) the r sub-chains are
    # independent inside ONE kernel invocation, so Mosaic overlaps sub t+1's
    # QK matmul with sub t's exp2/sum VPU work while every matmul keeps the
    # full block_q width (the round-2 sub-blocking loss came from SHRINKING
    # the matmuls; this keeps them and still buys the interleave). Only a
    # whole-multiple tile with no extra padding qualifies; the backward
    # keeps square blocks.
    block_k_fwd = int(os.environ.get("XTUNER_FLASH_BLOCK_K", 2 * block_q))
    if not (block_k_fwd > block_q and block_k_fwd % block_q == 0
            and (l + pad) % block_k_fwd == 0):
        block_k_fwd = 0

    qt = jnp.swapaxes(q, 1, 2)  # (B, Hq, L, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if max_logit is not None:
        max_logit = jnp.asarray(max_logit, jnp.float32)
    out = _flash(qt, kt, vt, segment_ids, sinks, max_logit, scale, causal, window,
                 block_q, block_k, interpret, block_k_fwd)
    out = jnp.swapaxes(out, 1, 2)
    if pad:
        out = out[:, :l]
    return out
