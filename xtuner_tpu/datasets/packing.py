"""Sequence packing.

Reference: xtuner/v1/datasets/packing.py — `ExpandSoftPackDataset` (:314)
bin-fills samples into pack_max_length bins; `HardPackDataset` (:490) splits
samples across pack boundaries for zero padding. Here:

- SoftPackDataset: deterministic shuffled first-fit binning over the
  precomputed token counts; samples longer than pack_max_length are truncated.
- HardPackDataset: contiguous token stream chopped into exact-length rows
  (pretrain-style; documents keep their own segment ids but may split).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()


class SoftPackDataset:
    """item = list of (dataset_idx, sample_idx) forming one packed row."""

    def __init__(self, datasets: Sequence, pack_max_length: int = 16384, seed: int = 0,
                 expand_buffer: int = 1000):
        self.datasets = list(datasets)
        self.pack_max_length = pack_max_length
        self.packs: list[list[tuple[int, int]]] = []
        rng = np.random.default_rng(seed)

        entries = []  # (num_tokens, ds_idx, sample_idx)
        for di, ds in enumerate(self.datasets):
            counts = np.minimum(ds.num_tokens, pack_max_length)
            for si, c in enumerate(counts):
                if c <= 0:
                    continue
                entries.append((int(c), di, si))
        order = rng.permutation(len(entries))

        # streaming first-fit over a bounded window of open bins
        open_bins: list[tuple[int, list[tuple[int, int]]]] = []  # (remaining, items)
        for oi in order:
            c, di, si = entries[oi]
            placed = False
            for bi, (rem, items) in enumerate(open_bins):
                if c <= rem:
                    items.append((di, si))
                    rem -= c
                    if rem < 64:  # effectively full
                        self.packs.append(items)
                        open_bins.pop(bi)
                    else:
                        open_bins[bi] = (rem, items)
                    placed = True
                    break
            if not placed:
                open_bins.append((pack_max_length - c, [(di, si)]))
            if len(open_bins) > expand_buffer:
                rem, items = open_bins.pop(0)
                self.packs.append(items)
        for _, items in open_bins:
            self.packs.append(items)
        total = sum(len(p) for p in self.packs)
        logger.info(
            f"[pack] {total} samples -> {len(self.packs)} packs of {pack_max_length} tokens"
        )

    def __len__(self) -> int:
        return len(self.packs)

    def __getitem__(self, i: int) -> list[dict]:
        out = []
        for di, si in self.packs[i]:
            sample = self.datasets[di][si]
            n = self.pack_max_length
            if sample["num_tokens"] > n:
                sample = {
                    "input_ids": sample["input_ids"][:n],
                    "labels": sample["labels"][:n],
                    "num_tokens": n,
                }
            out.append(sample)
        return out


class HardPackDataset:
    """Exact-length packing: the token stream of all samples is chopped into
    pack_max_length rows; a document may span two rows (each part keeps its
    own segment id so attention never crosses the cut)."""

    def __init__(self, datasets: Sequence, pack_max_length: int = 16384, seed: int = 0):
        self.datasets = list(datasets)
        self.pack_max_length = pack_max_length
        rng = np.random.default_rng(seed)
        entries = []
        for di, ds in enumerate(self.datasets):
            counts = ds.num_tokens
            for si in range(len(counts)):
                entries.append((di, si, int(counts[si])))
        order = rng.permutation(len(entries))
        self.order = [entries[i] for i in order]
        total_tokens = sum(e[2] for e in self.order)
        self.num_packs = total_tokens // pack_max_length
        # index: for each pack, (start_entry, start_offset)
        self._index = []
        cum = 0
        entry_i, entry_off = 0, 0
        for _ in range(self.num_packs):
            self._index.append((entry_i, entry_off))
            remaining = pack_max_length
            while remaining > 0 and entry_i < len(self.order):
                avail = self.order[entry_i][2] - entry_off
                take = min(avail, remaining)
                remaining -= take
                entry_off += take
                if entry_off >= self.order[entry_i][2]:
                    entry_i += 1
                    entry_off = 0

    def __len__(self) -> int:
        return self.num_packs

    def __getitem__(self, i: int) -> list[dict]:
        entry_i, entry_off = self._index[i]
        remaining = self.pack_max_length
        out = []
        while remaining > 0 and entry_i < len(self.order):
            di, si, n = self.order[entry_i]
            sample = self.datasets[di][si]
            take = min(n - entry_off, remaining)
            out.append({
                "input_ids": sample["input_ids"][entry_off:entry_off + take],
                "labels": sample["labels"][entry_off:entry_off + take],
                "num_tokens": take,
            })
            remaining -= take
            entry_off += take
            if entry_off >= n:
                entry_i += 1
                entry_off = 0
        return out
