"""Paged KV cache with prompt-prefix sharing.

Reference: xtuner/v1/module/attention/kv_cache.py (block-paged KV pool +
block tables consumed by flash_attn_with_kvcache / flash_mla, mla.py:83-123).
TPU redesign: the pool is one global (num_blocks, block_size, H, D) array per
layer stack; per-sequence block tables are plain int32 gather indices, so
"paging" lowers to XLA gathers — no pointer chasing. The allocator runs on
the host between jitted steps (block ids are static per decode call).

The headline win for RL rollout is PREFIX SHARING: all G rollouts of a GRPO
group reference the SAME prompt blocks (allocated once), so prompt KV memory
is B/G x smaller and prefill runs once per unique prompt (reference serving
engines' prefix caching).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PagedAllocator:
    """Host-side block allocator with reference counts (prefix sharing)."""

    num_blocks: int
    block_size: int
    refcount: np.ndarray = field(init=False)

    def __post_init__(self):
        self.refcount = np.zeros(self.num_blocks, np.int32)
        # optional shortfall hook: called with the deficit before alloc
        # gives up, so a prefix cache (module/prefix_cache.py) can evict
        # retained blocks on demand
        self.reclaim = None

    @property
    def free_blocks(self) -> int:
        return int((self.refcount == 0).sum())

    def alloc(self, n: int) -> list[int]:
        free = np.where(self.refcount == 0)[0]
        if len(free) < n and self.reclaim is not None:
            self.reclaim(n - len(free))
            free = np.where(self.refcount == 0)[0]
        if len(free) < n:
            raise MemoryError(f"paged KV pool exhausted: need {n}, free {len(free)}")
        ids = free[:n].tolist()
        self.refcount[ids] += 1
        return ids

    def share(self, block_ids: list[int]) -> list[int]:
        """Add a reference to existing blocks (prefix sharing)."""
        self.refcount[block_ids] += 1
        return list(block_ids)

    def release(self, block_ids: list[int]) -> None:
        self.refcount[block_ids] = np.maximum(self.refcount[block_ids] - 1, 0)


class PagedKVCache:
    """One layer-stack's paged pool + per-sequence tables.

    pool_k/pool_v: (L, num_blocks, block_size, H, D); block tables are built
    host-side as (B, max_blocks) int32 (padded with 0 — masked by seq_lens).
    """

    def __init__(self, n_layers: int, num_blocks: int, block_size: int,
                 num_kv_heads: int, head_dim: int, dtype=jnp.bfloat16,
                 head_dim_v: Optional[int] = None):
        """head_dim_v: v-pool head dim when it differs from k's — MLA's
        compressed cache stores the kv_lora_rank latent in pool_k and the
        shared qk_rope_head_dim rope key in pool_v (mla.py:83-123).

        dtype int8 = quantized cache: each row stores head_dim int8 codes
        + a packed f32 per-(token, head) scale (see pack_kv_int8)."""
        self.block_size = block_size
        self.allocator = PagedAllocator(num_blocks, block_size)
        self.quantized = jnp.dtype(dtype) == jnp.int8
        kd, vd = head_dim, head_dim_v or head_dim
        if self.quantized:
            kd, vd = quant_dim(kd), quant_dim(vd)
        self.pool_k = jnp.zeros((n_layers, num_blocks, block_size, num_kv_heads, kd), dtype)
        self.pool_v = jnp.zeros(
            (n_layers, num_blocks, block_size, num_kv_heads, vd), dtype)
        self.tables: dict[int, list[int]] = {}  # seq id -> block ids
        self.seq_lens: dict[int, int] = {}

    # ---------------- host-side bookkeeping ----------------
    def add_sequence(self, seq_id: int, n_tokens: int) -> None:
        """Reserve blocks for n_tokens (0 allowed: empty sequence)."""
        blocks = self.allocator.alloc(-(-n_tokens // self.block_size)) if n_tokens else []
        self.tables[seq_id] = blocks
        self.seq_lens[seq_id] = n_tokens

    def extend(self, seq_id: int, n_new: int) -> None:
        """Grow a sequence by n_new tokens, allocating blocks as needed. A
        SHARED last block would be corrupted by appends — the caller must
        only share block-aligned prefixes (enforced in share_prefix)."""
        cur = self.seq_lens[seq_id]
        need = -(-(cur + n_new) // self.block_size) - len(self.tables[seq_id])
        if need > 0:
            self.tables[seq_id] += self.allocator.alloc(need)
        self.seq_lens[seq_id] += n_new

    def share_prefix(self, src_id: int, dst_id: int) -> None:
        """dst starts as a reference to src's block-ALIGNED prefix; the
        unaligned tail tokens must be rewritten by the caller."""
        aligned = (self.seq_lens[src_id] // self.block_size) * self.block_size
        n_blocks = aligned // self.block_size
        blocks = self.allocator.share(self.tables[src_id][:n_blocks])
        self.tables[dst_id] = blocks
        self.seq_lens[dst_id] = aligned

    def release(self, seq_id: int) -> None:
        self.allocator.release(self.tables.pop(seq_id))
        self.seq_lens.pop(seq_id)

    def block_table(self, seq_ids: list[int], max_blocks: Optional[int] = None) -> np.ndarray:
        mb = max_blocks or max(len(self.tables[s]) for s in seq_ids)
        out = np.zeros((len(seq_ids), mb), np.int32)
        for i, s in enumerate(seq_ids):
            ids = self.tables[s]
            out[i, :len(ids)] = ids
        return out

    def lens(self, seq_ids: list[int]) -> np.ndarray:
        return np.asarray([self.seq_lens[s] for s in seq_ids], np.int32)


# ---------------- device ops (pure, jittable) ----------------
# int8 KV quantization (the paged analog of LMDeploy/vLLM KV-int8 serving —
# reference rollouts delegate to those engines, rl/rollout/worker.py:510).
# Layout: each pool row packs `D` int8 codes + 4 bytes that ARE the f32
# per-(token, head) absmax scale (bitcast), so the pool stays ONE array and
# every caller's plumbing is unchanged. The scale never multiplies K/V back
# to bf16 in HBM: it is positive, so it folds out of the attention algebra —
# logits(s) *= scale_k(s) after the QK dot, probs(s) *= scale_v(s) before
# the PV dot, and even DSA's relu(q . k) * w indexer commutes with it.
KV_SCALE_BYTES = 4


def quant_dim(head_dim: int) -> int:
    """Packed pool row width for an int8 pool holding `head_dim` values."""
    return head_dim + KV_SCALE_BYTES


def pack_kv_int8(values):
    """(..., H, D) float -> (..., H, D+4) int8: per-(token, head) absmax
    quantization, f32 scale bitcast into the trailing 4 bytes."""
    scale = jnp.maximum(jnp.max(jnp.abs(values.astype(jnp.float32)), -1),
                        1e-6) / 127.0  # (..., H)
    q = jnp.round(values.astype(jnp.float32) / scale[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    sb = jax.lax.bitcast_convert_type(scale, jnp.int8)  # (..., H, 4)
    return jnp.concatenate([q, sb], axis=-1)


def unpack_kv_int8(packed):
    """(..., H, D+4) int8 -> (int8 codes (..., H, D), f32 scale (..., H))."""
    q = packed[..., :-KV_SCALE_BYTES]
    s = jax.lax.bitcast_convert_type(packed[..., -KV_SCALE_BYTES:],
                                     jnp.float32)
    return q, s


def paged_write(pool, layer: int, block_table, positions, values):
    """Scatter one token per sequence into the pool.

    pool: (L, NB, BS, H, D); block_table (B, MB) int32; positions (B,) int32
    token position within each sequence; values (B, H, D). An int8 pool
    (quantized cache) packs values via pack_kv_int8."""
    bs = pool.shape[2]
    if pool.dtype == jnp.int8 and values.dtype != jnp.int8:
        values = pack_kv_int8(values)
    blk = jnp.take_along_axis(block_table, (positions // bs)[:, None], axis=1)[:, 0]
    off = positions % bs
    return pool.at[layer, blk, off].set(values.astype(pool.dtype))


def paged_write_prefill(pool, layer: int, block_table, values, start: int = 0):
    """Write a whole prompt chunk: values (B, P, H, D) at positions
    start..start+P (host-static P)."""
    b, p_len = values.shape[:2]
    bs = pool.shape[2]
    if pool.dtype == jnp.int8 and values.dtype != jnp.int8:
        values = pack_kv_int8(values)
    pos = start + jnp.arange(p_len)
    blk = block_table[:, :]  # (B, MB)
    blk_idx = jnp.take_along_axis(
        jnp.broadcast_to(blk[:, None, :], (b, p_len, blk.shape[1])),
        (pos // bs)[None, :, None].repeat(b, 0), axis=2)[:, :, 0]
    off = (pos % bs)[None, :].repeat(b, 0)
    return pool.at[layer, blk_idx, off].set(values.astype(pool.dtype))


def paged_gather(pool, layer: int, block_table):
    """(B, MB*BS, H, D) contiguous view of each sequence's cache."""
    g = pool[layer][block_table]  # (B, MB, BS, H, D)
    b, mb, bs, h, d = g.shape
    return g.reshape(b, mb * bs, h, d)


def paged_attention(q, pool_k, pool_v, layer: int, block_table, seq_lens,
                    *, scale: Optional[float] = None, num_q_heads: Optional[int] = None):
    """Decode attention against a paged cache.

    q: (B, Hq, D) single query per sequence; block_table (B, MB); seq_lens
    (B,) valid token counts. Gather-based: XLA turns the block gather into a
    dynamic-gather fusion; B*MB*BS stays small in decode."""
    k = paged_gather(pool_k, layer, block_table)  # (B, S, Hkv, D)
    v = paged_gather(pool_v, layer, block_table)
    b, s, hkv, d = k.shape
    hq = q.shape[1]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = jnp.arange(s)[None, :] < seq_lens[:, None]
    logits = jnp.where(mask[:, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", probs, v.astype(jnp.float32)).astype(q.dtype)
