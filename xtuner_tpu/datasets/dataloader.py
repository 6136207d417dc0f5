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
                 pad_token_id: int = 0):
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
        self._sampler_iter = iter(self.sampler)
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None

    def __len__(self) -> int:
        return max(len(self.dataset) // self.global_batch_rows, 1)

    def _next_batch(self) -> dict[str, np.ndarray]:
        rows = [self.dataset[next(self._sampler_iter)] for _ in range(self.global_batch_rows)]
        a, b = self.grad_accum, self.micro_batch_rows
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
