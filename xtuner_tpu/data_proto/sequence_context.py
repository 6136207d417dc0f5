"""SequenceContext — THE tensor-batch protocol passed into models.

Capability analog of the reference's SequenceContext
(xtuner/v1/data_proto/sequence_context.py:58-643), redesigned for XLA:

- The reference packs each micro-batch to one ``(1, total_len)`` row and
  carries ``cu_seq_lens_q/k`` for flash-varlen CUDA kernels. On TPU we keep
  **static shapes** and use **segment ids**: a batch is ``(B, L)`` packed rows
  (L = pack_max_length), where ``segment_ids[b, t]`` numbers the document a
  token belongs to (0 = padding). Attention masks are
  ``(seg_q == seg_k) & causal & seg != 0`` — the block-diagonal mask the
  reference builds from cu_seqlens, but in a form Pallas/XLA can tile.
- ``position_ids`` restart at document boundaries (same semantics as
  sequence_context.py:178-185).
- SP sharding is NOT a method here: under GSPMD the same global array is simply
  annotated with a ``seq -> sp`` sharding constraint; the manual
  ``split()/pad_to_multiple`` dance (sequence_context.py:233-309) disappears.

VLM fields (pixel_values, image grids, deepstack embeds) mirror the reference
and are None for text-only batches.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class SequenceContext:
    input_ids: jax.Array  # (B, L) int32 packed token ids
    segment_ids: jax.Array  # (B, L) int32, 0 = padding, docs numbered from 1
    position_ids: jax.Array  # (B, L) int32, restart per document
    # --- VLM (mirrors reference fields; None for text-only) ---
    pixel_values: Optional[jax.Array] = None  # (num_tiles, C, H, W) or patchified (P, patch_dim)
    image_grid_thw: Optional[jax.Array] = None
    image_token_mask: Optional[jax.Array] = None  # (B, L) bool: positions receiving vision embeds
    inputs_embeds: Optional[jax.Array] = None  # (B, L, H) precomputed embeddings
    # --- Qwen3-VL (reference sequence_context.py deepstack/mrope fields) ---
    mrope_positions: Optional[jax.Array] = None  # (B, 3, L) int32 (t, h, w) positions
    deepstack_embeds: Optional[jax.Array] = None  # (n_ds, B, L, H): pre-scattered layer adds
    # host-precomputed ViT geometry (collator output; static per batch):
    vision_segment_ids: Optional[jax.Array] = None  # (P,) int32, 0 = pad patch
    vision_rot_pos: Optional[jax.Array] = None  # (P, 2) int32 (row, col) per patch
    vision_pos_interp_idx: Optional[jax.Array] = None  # (P, 4) int32 into pos_embed table
    vision_pos_interp_w: Optional[jax.Array] = None  # (P, 4) fp32 bilinear weights
    # --- MoE rollout replay (reference: rollout_routed_experts) ---
    rollout_routed_experts: Optional[jax.Array] = None

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def from_input_ids(cls, input_ids, pad_token_id: int | None = None) -> "SequenceContext":
        """One document per row; padding inferred from pad_token_id (or none)."""
        input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
        if input_ids.ndim == 1:
            input_ids = input_ids[None, :]
        if pad_token_id is None:
            segment_ids = jnp.ones_like(input_ids)
        else:
            segment_ids = jnp.where(input_ids != pad_token_id, 1, 0).astype(jnp.int32)
        position_ids = jnp.cumsum(segment_ids != 0, axis=-1).astype(jnp.int32) - 1
        position_ids = jnp.maximum(position_ids, 0)
        return cls(input_ids=input_ids, segment_ids=segment_ids, position_ids=position_ids)

    @classmethod
    def from_packed(cls, input_ids, cu_seq_lens, pack_max_length: int | None = None) -> "SequenceContext":
        """Build from the reference's packed representation: a flat id array
        plus cumulative sequence lengths (host-side; numpy)."""
        ids = np.asarray(input_ids, dtype=np.int32).reshape(-1)
        cu = np.asarray(cu_seq_lens, dtype=np.int64)
        total = pack_max_length or ids.shape[0]
        seg = np.zeros(total, dtype=np.int32)
        pos = np.zeros(total, dtype=np.int32)
        out = np.zeros(total, dtype=np.int32)
        out[: ids.shape[0]] = ids[:total]
        for i in range(len(cu) - 1):
            s, e = int(cu[i]), int(min(cu[i + 1], total))
            if s >= total:
                break
            seg[s:e] = i + 1
            pos[s:e] = np.arange(e - s)
        return cls(
            input_ids=jnp.asarray(out[None, :]),
            segment_ids=jnp.asarray(seg[None, :]),
            position_ids=jnp.asarray(pos[None, :]),
        )

    # ------------------------------------------------------------------
    # properties / utilities
    # ------------------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.input_ids.shape[0]

    @property
    def seq_len(self) -> int:
        return self.input_ids.shape[1]

    @property
    def mask(self) -> jax.Array:
        """(B, L) bool: True for real (non-padding) tokens."""
        return self.segment_ids != 0

    @property
    def num_tokens(self) -> jax.Array:
        """Scalar count of non-padding tokens (global under GSPMD)."""
        return jnp.sum(self.mask)

    def cu_seq_lens(self) -> np.ndarray:
        """Host-side cumulative lengths per row (for interop/tests). Only
        valid on concrete (non-traced) arrays."""
        seg = np.asarray(self.segment_ids)
        outs = []
        for row in seg:
            # boundaries where segment id changes and is nonzero
            lens = []
            cur, count = 0, 0
            for s in row:
                if s != cur:
                    if cur != 0:
                        lens.append(count)
                    cur, count = s, 0
                if s != 0:
                    count += 1
            if cur != 0:
                lens.append(count)
            outs.append(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        return outs[0] if len(outs) == 1 else outs

    def replace(self, **kwargs: Any) -> "SequenceContext":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def cat(cls, ctxs: list["SequenceContext"]) -> "SequenceContext":
        """Concatenate along batch dim (analog of reference cat :311)."""
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *ctxs)
