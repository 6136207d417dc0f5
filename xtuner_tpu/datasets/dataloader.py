"""Dataloader: yields (A, B, L) numpy step-batches with resume state.

Reference: xtuner/v1/datasets/dataloader.py (BaseDataloader/Dataloader with
load_state_dict/get_state_dict for mid-epoch resume). One "step batch" feeds
one optimizer step: A = grad-accum micro-batches x B = packed rows each.
A background thread keeps `prefetch` batches ready so host tokenization
overlaps device compute (the reference uses torch dataloader worker procs).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .collator import sft_llm_collator


class Dataloader:
    def __init__(self, packed_dataset, sampler, pack_max_length: int,
                 global_batch_rows: int, micro_batch_rows: int,
                 loss_reduction: str = "token", num_workers: int = 0, prefetch: int = 2,
                 max_tiles: int = 0, max_patches: int = 0,
                 num_grid_per_side: int = 48, merge_size: int = 2,
                 pad_token_id: int = 0, local_b_rows: "Optional[list[int]]" = None):
        if global_batch_rows % micro_batch_rows != 0:
            raise ValueError("global_batch_rows must be divisible by micro_batch_rows")
        self.dataset = packed_dataset
        self.sampler = sampler
        self.pack_max_length = pack_max_length
        self.global_batch_rows = global_batch_rows
        self.micro_batch_rows = micro_batch_rows
        self.grad_accum = global_batch_rows // micro_batch_rows
        self.loss_reduction = loss_reduction
        self.max_tiles = max_tiles  # >0 enables the InternVL tile collator
        self.max_patches = max_patches  # >0 enables the Qwen3-VL patch collator
        self.num_grid_per_side = num_grid_per_side
        self.merge_size = merge_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.pad_token_id = pad_token_id
        # multihost data-plane sharding: when set, only these b-dim rows of
        # each micro-batch are tokenized/collated on this process (the others
        # belong to other processes' devices; engine.put_batch assembles the
        # global array from per-process local blocks). The sampler still
        # advances through EVERY global index so its resume state — and the
        # pack->row assignment — is identical on all ranks (reference:
        # per-rank ParallelSampler, xtuner/v1/datasets/sampler.py:28).
        # None = single-process (materialize everything).
        self.local_b_rows = sorted(local_b_rows) if local_b_rows is not None else None
        if self.local_b_rows is not None and (max_tiles > 0 or max_patches > 0):
            # VLM collators build variable-geometry patch arrays whose global
            # layout depends on every row; keep full materialization there
            self.local_b_rows = None
        self._sampler_iter = iter(self.sampler)
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None

    def __len__(self) -> int:
        return max(len(self.dataset) // self.global_batch_rows, 1)

    def _next_batch(self) -> dict[str, np.ndarray]:
        a, b = self.grad_accum, self.micro_batch_rows
        if self.local_b_rows is not None:
            return self._next_batch_local(a, b)
        rows = [self.dataset[next(self._sampler_iter)] for _ in range(self.global_batch_rows)]
        if self.max_patches > 0:
            from .qwen_vl import qwen3vl_collator

            micro = [qwen3vl_collator(rows[i * b:(i + 1) * b], self.pack_max_length,
                                      self.loss_reduction, max_patches=self.max_patches,
                                      num_grid_per_side=self.num_grid_per_side,
                                      merge_size=self.merge_size,
                                      pad_token_id=self.pad_token_id)
                     for i in range(a)]
            keys = micro[0].keys()
            return {k: np.stack([m[k] for m in micro]) for k in keys}
        if self.max_tiles > 0:
            from .vlm import vlm_collator

            micro = [vlm_collator(rows[i * b:(i + 1) * b], self.pack_max_length,
                                  self.loss_reduction, max_tiles=self.max_tiles,
                                  pad_token_id=self.pad_token_id)
                     for i in range(a)]
            keys = micro[0].keys()
            return {k: np.stack([m[k] for m in micro]) for k in keys}
        batch = sft_llm_collator(rows, self.pack_max_length, self.loss_reduction,
                                 pad_token_id=self.pad_token_id)
        return {k: v.reshape(a, b, -1) for k, v in batch.items()}

    def _next_batch_local(self, a: int, b: int) -> dict[str, np.ndarray]:
        """Per-process sharded batch: advance the sampler through all
        global_batch_rows indices (identical state on every rank), but fetch +
        tokenize + collate ONLY this process's b-rows. Non-local rows stay
        zero-filled and are never read — engine.put_batch's
        make_array_from_callback only touches local index slices, so the
        untouched pages cost no physical memory and no tokenizer time."""
        idxs = [next(self._sampler_iter) for _ in range(self.global_batch_rows)]
        local_b = self.local_b_rows
        # row r of the flat (a*b) layout = micro-batch r//b, b-row r%b
        local_rows = [self.dataset[idxs[ai * b + bi]] for ai in range(a) for bi in local_b]
        local = sft_llm_collator(local_rows, self.pack_max_length, self.loss_reduction,
                                 pad_token_id=self.pad_token_id)
        nl = len(local_b)
        out = {}
        for k, v in local.items():
            full = np.zeros((a, b) + v.shape[1:], v.dtype)
            full[:, local_b] = v.reshape((a, nl) + v.shape[1:])
            out[k] = full
        return out

    def _worker(self):
        while True:
            self._queue.put(self._next_batch())

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        if self.num_workers > 0:
            if self._thread is None:
                self._queue = queue.Queue(maxsize=self.prefetch)
                self._thread = threading.Thread(target=self._worker, daemon=True)
                self._thread.start()
            while True:
                yield self._queue.get()
        else:
            while True:
                yield self._next_batch()

    # ------------------------------------------------------------------
    def get_state_dict(self) -> dict:
        return {"sampler": self.sampler.get_state_dict()}

    def load_state_dict(self, state: dict) -> None:
        self.sampler.load_state_dict(state["sampler"])
        self._sampler_iter = iter(self.sampler)
