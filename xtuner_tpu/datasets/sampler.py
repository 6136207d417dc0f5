"""Resumable samplers.

Reference: xtuner/v1/datasets/sampler.py (ParallelSampler :28 with
load_state_dict mid-epoch resume; LengthGroupedSampler :179). Single-controller
JAX assembles the *global* batch on the host, so the sampler yields global
indices; sharding happens at device_put.
"""

from __future__ import annotations

import numpy as np


class ParallelSampler:
    """Infinite epoch-shuffled index stream with exact-position resume."""

    def __init__(self, dataset_len: int, seed: int = 0, shuffle: bool = True):
        self.dataset_len = dataset_len
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0
        self.consumed = 0  # indices consumed within current epoch

    def _epoch_order(self, epoch: int) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.dataset_len)
        rng = np.random.default_rng(self.seed + epoch)
        return rng.permutation(self.dataset_len)

    def __iter__(self):
        while True:
            order = self._epoch_order(self.epoch)
            while self.consumed < self.dataset_len:
                idx = int(order[self.consumed])
                self.consumed += 1
                yield idx
            self.epoch += 1
            self.consumed = 0

    def get_state_dict(self) -> dict:
        return {"epoch": self.epoch, "consumed": self.consumed, "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state["epoch"]
        self.consumed = state["consumed"]
        self.seed = state.get("seed", self.seed)


class LengthGroupedSampler(ParallelSampler):
    """Groups indices by similar length inside shuffled mega-batches
    (reference sampler.py:179) to reduce padding variance across the batch."""

    def __init__(self, dataset_len: int, lengths, group_size: int, seed: int = 0):
        super().__init__(dataset_len, seed=seed, shuffle=True)
        self.lengths = np.asarray(lengths)
        self.group_size = group_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(self.dataset_len)
        out = []
        for start in range(0, self.dataset_len, self.group_size):
            chunk = order[start:start + self.group_size]
            out.append(chunk[np.argsort(self.lengths[chunk])[::-1]])
        return np.concatenate(out)


class PresetSampler:
    """Consumes packs in a user-supplied global order from a 1-D int .npy
    file (mmap'd — reference preset_sampler.py). The order may over-sample
    (longer than the dataset) or subset it; total length is rounded down to a
    multiple of `round_to` (the global batch size) and iteration is finite
    with exact-position resume."""

    def __init__(self, order_path: str, dataset_len: int, round_to: int = 1):
        if not str(order_path).endswith(".npy"):
            raise ValueError("PresetSampler needs a .npy order file (mmap read)")
        order = np.load(order_path, mmap_mode="r")
        if order.ndim != 1 or not np.issubdtype(order.dtype, np.integer):
            raise ValueError(f"order file must be 1-D integer, got {order.dtype} {order.shape}")
        bad = np.where((order < 0) | (order >= dataset_len))[0]
        if bad.size:
            raise ValueError(
                f"{bad.size} pack index(es) out of range [0, {dataset_len}); "
                f"first at position {int(bad[0])} -> {int(order[bad[0]])}")
        n = (len(order) // max(round_to, 1)) * max(round_to, 1)
        self.order = order[:n]  # mmap view, no copy
        self.consumed = 0

    def __len__(self) -> int:
        return len(self.order)

    def __iter__(self):
        while self.consumed < len(self.order):
            idx = int(self.order[self.consumed])
            self.consumed += 1
            yield idx

    def get_state_dict(self) -> dict:
        return {"consumed": self.consumed}

    def load_state_dict(self, state: dict) -> None:
        self.consumed = state["consumed"]
