"""Pallas TPU paged-attention decode kernel.

The serving-side analog of the reference's vLLM/LMDeploy paged-attention
CUDA kernels (xtuner/v1 rollouts delegate decode to those engines;
reference rl/rollout/worker.py:510). TPU-native design:

- Grid (B, MB): one program per (sequence slot, table entry). The pool
  block to fetch comes from a *scalar-prefetched* block table read inside
  the BlockSpec index map, so the Pallas pipeline streams exactly the
  blocks each sequence owns, double-buffered against compute — no manual
  DMA/semaphore choreography (a first version with run_scoped + explicit
  make_async_copy measured 4x SLOWER than the XLA gather at batch 32: the
  per-program scratch/semaphore prologue dwarfed the sub-us compute).
- Table entries outside a sequence's valid range [start, n_blocks) clamp
  their index map to a block that is already resident, which Mosaic
  recognizes as "no new fetch" (same trick as flash.py's causal skip), and
  `pl.when` skips their compute — a padded table costs neither bandwidth
  nor FLOPs, unlike the XLA gather path which materializes the full
  (B, MB*BS, Hkv, D) window.
- A block is fetched as a whole (BS, Hkv, D) slab — contiguous in the pool
  layout (L, NB, BS, H, D); all kv heads ride one fetch and the rep*C
  query rows of each head contract against their slab slice.
- Online softmax in base-2 (flash.py convention), f32 running (m, l, acc)
  in VMEM scratch persisting across the MB grid steps of one sequence.
- Sliding window: valid blocks *start* at the window's first block (the
  index-map clamp skips older blocks' fetch AND compute); the boundary
  block is masked per-slot. GPT-OSS sinks join the softmax denominator at
  finalization (exact, same math as the dense path).

Not handled here (callers fall back to the XLA gather path): MLA/DSA
compressed-KV decode (different contraction), head_dim not a multiple of
128, pool block_size not a multiple of 16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def paged_decode_eligible(pool_k, pool_v, head_dim: int, block_size: int) -> bool:
    return (
        head_dim % 128 == 0
        and block_size % 16 == 0
        and pool_k.dtype == pool_v.dtype
        and pool_k.dtype in (jnp.bfloat16, jnp.float32)
        and pool_k.shape[-1] == head_dim  # MLA packs latent+idx rows instead
        and pool_v.shape[-1] == head_dim
    )


def _start_block(seq_len, win, bs):
    # first block any row can see: rows attend slot > qpos - w, min qpos =
    # seq_len; w <= 0 means full attention
    return jnp.where(win > 0, jnp.maximum(seq_len + 1 - win, 0) // bs,
                     jnp.int32(0))


def _kernel(bt_ref, len_ref, win_ref, lay_ref, q_ref, sink_ref, k_ref, v_ref,
            o_ref, m_scr, l_scr, acc_scr, *, bs, hkv, rep, c, qr_pad, d,
            has_sinks, has_window):
    b, i = pl.program_id(0), pl.program_id(1)
    mb = pl.num_programs(1)
    seq_len = len_ref[b]
    n_blk = (seq_len + c + bs - 1) // bs
    win = win_ref[0] if has_window else jnp.int32(0)
    start = _start_block(seq_len, win, bs) if has_window else jnp.int32(0)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    rows = jax.lax.broadcasted_iota(jnp.int32, (qr_pad, 1), 0)[:, 0]
    # row r of head-group g is chunk token min(r // rep, c-1) (padded rows
    # clamp to the last chunk token: harmless, sliced off outside)
    qpos = seq_len + jnp.minimum(rows // rep, c - 1)

    @pl.when((i >= start) & (i < n_blk))
    def _compute():
        slot_ids = i * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)[:, 0]
        mask = slot_ids[None, :] <= qpos[:, None]  # (qr_pad, bs)
        if has_window:
            mask = mask & ((win <= 0) | (qpos[:, None] - slot_ids[None, :] < win))
        for g in range(hkv):
            s = jax.lax.dot_general(
                q_ref[0, g], k_ref[0, :, g, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (qr_pad, bs)
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[g * qr_pad:(g + 1) * qr_pad, 0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new[:, None])
            p = jnp.where(mask, p, 0.0)
            l_new = (l_scr[g * qr_pad:(g + 1) * qr_pad, 0] * alpha
                     + jnp.sum(p, axis=1))
            acc_scr[g] = acc_scr[g] * alpha[:, None] + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, :, g, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            m_scr[g * qr_pad:(g + 1) * qr_pad, :] = jnp.broadcast_to(
                m_new[:, None], (qr_pad, 128))
            l_scr[g * qr_pad:(g + 1) * qr_pad, :] = jnp.broadcast_to(
                l_new[:, None], (qr_pad, 128))

    @pl.when(i == mb - 1)
    def _finalize():
        for g in range(hkv):
            mg = m_scr[g * qr_pad:(g + 1) * qr_pad, 0]
            lg = l_scr[g * qr_pad:(g + 1) * qr_pad, 0]
            ag = acc_scr[g]
            if has_sinks:
                snk = sink_ref[g] * LOG2E  # (qr_pad,) base-2 sink logits
                mn = jnp.maximum(mg, snk)
                resc = jnp.exp2(mg - mn)
                ag = ag * resc[:, None]
                lg = lg * resc + jnp.exp2(snk - mn)
            o_ref[0, g] = (ag / lg[:, None]).astype(o_ref.dtype)


# NOTE on the logit scale: it is folded into q OUTSIDE the kernel together
# with log2(e) (flash.py convention), so the kernel itself is scale-free.
def paged_decode_attn(q, pool_k, pool_v, layer, block_table, seq_lens,
                      *, scale: float, window=None, sinks=None,
                      interpret: bool = False):
    """q: (B, C, Hq, D) pool-dtype; pool_*: (L, NB, BS, Hkv, D);
    block_table: (B, MB) int32; seq_lens: (B,) int32 — tokens cached BEFORE
    this chunk (chunk token i sits at seq_lens+i and must already be written
    to the pool). window: None | int | traced int32 (<=0 = full);
    sinks: optional (Hq,) per-head sink logits. Returns (B, C, Hq, D) f32."""
    b, c, hq, d = q.shape
    _, _, bs, hkv, _ = pool_k.shape
    mb = block_table.shape[1]
    rep = hq // hkv
    qr = c * rep
    row_align = 16 if pool_k.dtype == jnp.bfloat16 else 8
    qr_pad = -(-qr // row_align) * row_align

    # (B, C, Hkv, rep, D) -> (B, Hkv, C*rep, D): row r = c*rep + j
    qk = q.astype(pool_k.dtype).reshape(
        b, c, hkv, rep, d).transpose(0, 2, 1, 3, 4).reshape(b, hkv, qr, d)
    qk = qk * jnp.asarray(scale * LOG2E, qk.dtype)
    if qr_pad != qr:
        qk = jnp.pad(qk, ((0, 0), (0, 0), (0, qr_pad - qr), (0, 0)))

    has_sinks = sinks is not None
    if has_sinks:
        # per-row sink logit: row r of group g is q head g*rep + r%rep
        srow = sinks.astype(jnp.float32).reshape(hkv, 1, rep)
        srow = jnp.broadcast_to(srow, (hkv, c, rep)).reshape(hkv, qr)
        srow = jnp.pad(srow, ((0, 0), (0, qr_pad - qr)),
                       constant_values=NEG_INF)
    else:
        srow = jnp.full((hkv, qr_pad), NEG_INF, jnp.float32)

    has_window = window is not None
    win_arr = jnp.reshape(
        jnp.asarray(window if has_window else 0, jnp.int32), (1,))
    lay_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    def pool_index(bi, i, bt, lens, win, lay):
        # clamp out-of-range entries to a resident block: i < start maps to
        # the first needed block (fetched at its own turn-0), i >= n_blk to
        # the last one — Mosaic skips the re-fetch for an unchanged index
        n_blk = (lens[bi] + c + bs - 1) // bs
        lo = (_start_block(lens[bi], win[0], bs) if has_window
              else jnp.int32(0))
        i_eff = jnp.clip(i, lo, n_blk - 1)
        return (lay[0], bt[bi, i_eff], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # block_table, seq_lens, window, layer
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, hkv, qr_pad, d), lambda bi, i, *_: (bi, 0, 0, 0)),
            pl.BlockSpec((hkv, qr_pad), lambda bi, i, *_: (0, 0)),
            pl.BlockSpec((None, 1, bs, hkv, d), pool_index),
            pl.BlockSpec((None, 1, bs, hkv, d), pool_index),
        ],
        out_specs=pl.BlockSpec((1, hkv, qr_pad, d),
                               lambda bi, i, *_: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * qr_pad, 128), jnp.float32),  # m
            pltpu.VMEM((hkv * qr_pad, 128), jnp.float32),  # l
            pltpu.VMEM((hkv, qr_pad, d), jnp.float32),     # acc
        ],
    )
    kern = functools.partial(
        _kernel, bs=bs, hkv=hkv, rep=rep, c=c, qr_pad=qr_pad, d=d,
        has_sinks=has_sinks, has_window=has_window)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, qr_pad, d), jnp.float32),
        interpret=interpret,
    )(block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), win_arr,
      lay_arr, qk, srow, pool_k, pool_v)

    # (B, Hkv, qr_pad, D) -> (B, C, Hq, D)
    out = out[:, :, :qr].reshape(b, hkv, c, rep, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, c, hq, d)
