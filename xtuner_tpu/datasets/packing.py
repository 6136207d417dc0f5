"""Sequence packing.

Reference: xtuner/v1/datasets/packing.py — `ExpandSoftPackDataset` (:314)
bin-fills samples into pack_max_length bins; `HardPackDataset` (:490) splits
samples across pack boundaries for zero padding. Here:

- SoftPackDataset: deterministic shuffled first-fit binning over the
  precomputed token counts; samples longer than pack_max_length are truncated.
- HardPackDataset: contiguous token stream chopped into exact-length rows
  (pretrain-style; documents keep their own segment ids but may split).
- PresetPackDataset: user-supplied NPY-CSR pack layout
  (reference preset_pack.py:57-291).
- HybridMLLMPackDataset: text datasets hard-packed, VLM datasets soft-packed,
  concatenated (reference packing.py:666 MLLMPretrainHybridPackDataset).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()


def attention_flops_proxy(num_tokens: int) -> float:
    """Per-sample compute proxy: packed causal attention cost grows with the
    square of the DOCUMENT length (not the pack length), so two packs with
    equal tokens can differ several-fold in attention FLOPs. Mirrors the
    reference's with_proxy_attention_flops (datasets/utils.py:105-134)."""
    return float(num_tokens) ** 2


class SoftPackDataset:
    """item = list of (dataset_idx, sample_idx) forming one packed row.

    balance="none": shuffled streaming first-fit (token capacity only).
    balance="flops": greedy best-fit decreasing with attention-FLOPs
    balancing — each sample goes to the open bin with room and the LOWEST
    accumulated FLOPs proxy, so packs come out compute-balanced and dp ranks
    don't straggle on long-document packs (reference packing.py:80-96)."""

    def __init__(self, datasets: Sequence, pack_max_length: int = 16384, seed: int = 0,
                 expand_buffer: int = 1000, balance: str = "none"):
        self.datasets = list(datasets)
        self.pack_max_length = pack_max_length
        self.packs: list[list[tuple[int, int]]] = []
        self.pack_flops: list[float] = []
        rng = np.random.default_rng(seed)

        entries = []  # (num_tokens, ds_idx, sample_idx)
        for di, ds in enumerate(self.datasets):
            counts = np.minimum(ds.num_tokens, pack_max_length)
            for si, c in enumerate(counts):
                if c <= 0:
                    continue
                entries.append((int(c), di, si))

        if balance == "flops":
            self._pack_flops_balanced(entries)
        else:
            self._pack_first_fit(entries, rng, expand_buffer)
        total = sum(len(p) for p in self.packs)
        logger.info(
            f"[pack] {total} samples -> {len(self.packs)} packs of {pack_max_length} tokens"
            + (f" (flops-balanced, cv {self.flops_cv():.3f})" if balance == "flops" else "")
        )

    def _pack_first_fit(self, entries, rng, expand_buffer: int) -> None:
        order = rng.permutation(len(entries))
        # streaming first-fit over a bounded window of open bins
        open_bins: list[tuple[int, list[tuple[int, int]], float]] = []
        for oi in order:
            c, di, si = entries[oi]
            f = attention_flops_proxy(c)
            placed = False
            for bi, (rem, items, fl) in enumerate(open_bins):
                if c <= rem:
                    items.append((di, si))
                    rem -= c
                    fl += f
                    if rem < 64:  # effectively full
                        self.packs.append(items)
                        self.pack_flops.append(fl)
                        open_bins.pop(bi)
                    else:
                        open_bins[bi] = (rem, items, fl)
                    placed = True
                    break
            if not placed:
                open_bins.append((self.pack_max_length - c, [(di, si)], f))
            if len(open_bins) > expand_buffer:
                rem, items, fl = open_bins.pop(0)
                self.packs.append(items)
                self.pack_flops.append(fl)
        for _, items, fl in open_bins:
            self.packs.append(items)
            self.pack_flops.append(fl)

    def _pack_flops_balanced(self, entries) -> None:
        # best-fit decreasing by tokens; bin choice = lowest accumulated flops
        # with room. Bin count is fixed up-front from total tokens so balancing
        # has a stable target.
        total_tokens = sum(c for c, _, _ in entries)
        n_bins = max(1, -(-total_tokens // self.pack_max_length))
        order = sorted(range(len(entries)), key=lambda i: -entries[i][0])
        rem = np.full(n_bins, self.pack_max_length, np.int64)
        flops = np.zeros(n_bins, np.float64)
        bins: list[list[tuple[int, int]]] = [[] for _ in range(n_bins)]
        for oi in order:
            c, di, si = entries[oi]
            fits = np.flatnonzero(rem >= c)
            if len(fits) == 0:
                rem = np.append(rem, self.pack_max_length)
                flops = np.append(flops, 0.0)
                bins.append([])
                fits = np.asarray([len(bins) - 1])
            bi = int(fits[np.argmin(flops[fits])])
            bins[bi].append((di, si))
            rem[bi] -= c
            flops[bi] += attention_flops_proxy(c)
        for bi, items in enumerate(bins):
            if items:
                self.packs.append(items)
                self.pack_flops.append(float(flops[bi]))

    def flops_cv(self) -> float:
        """Coefficient of variation of per-pack attention FLOPs (balance metric)."""
        f = np.asarray(self.pack_flops, np.float64)
        if len(f) == 0 or f.mean() == 0:
            return 0.0
        return float(f.std() / f.mean())

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


def save_pack_config(path: str | Path, boundaries: np.ndarray, samples: np.ndarray,
                     paths: list[str]) -> None:
    """Write a preset pack config directory (boundaries.npy / samples.npy /
    paths.json — reference preset_pack.py:1-10 NPY-CSR format)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    np.save(path / "boundaries.npy", np.asarray(boundaries, np.int64))
    np.save(path / "samples.npy", np.asarray(samples, np.int64))
    (path / "paths.json").write_text(json.dumps([str(p) for p in paths]))


class PresetPackDataset:
    """Pack groupings read from a user-supplied NPY-CSR directory.

    Reference: xtuner/v1/datasets/preset_pack.py (PresetPackDataset :57-291).
    Directory format: boundaries.npy int64 (num_packs+1,) CSR boundaries;
    samples.npy int64 (total_slices, 6) with columns [path_id, sample_idx,
    char_start, char_end, token_start, token_end] (char range -1/-1 for plain
    items); paths.json maps path_id -> dataset path.

    short_pack_strategy: "error" | "padding" (pad row appended with num_tokens
    set so collators pad to pack_max_length). long_pack_strategy: "error" |
    "truncate" (tail slices clipped at pack_max_length).
    """

    def __init__(self, datasets: Sequence, pack_config_path: str | Path,
                 pack_max_length: int, short_pack_strategy: str = "error",
                 long_pack_strategy: str = "error", mmap: bool = True,
                 pad_token_id: int = 0):
        self.datasets = list(datasets)
        self.pack_max_length = pack_max_length
        self.short_pack_strategy = short_pack_strategy
        self.long_pack_strategy = long_pack_strategy
        self.pad_token_id = pad_token_id
        d = Path(pack_config_path)
        mode = "r" if mmap else None
        self._boundaries = np.load(d / "boundaries.npy", mmap_mode=mode)
        self._samples = np.load(d / "samples.npy", mmap_mode=mode)
        paths = json.loads((d / "paths.json").read_text())
        by_path = {str(ds.path): i for i, ds in enumerate(self.datasets)}
        try:
            self._path_to_ds = [by_path[p] for p in paths]
        except KeyError as e:
            raise ValueError(f"pack config references unknown dataset path {e}") from None
        if self._samples.ndim != 2 or self._samples.shape[1] != 6:
            raise ValueError(f"samples.npy must be (n, 6), got {self._samples.shape}")
        logger.info(f"[preset-pack] {len(self)} packs from {d}")

    def __len__(self) -> int:
        return len(self._boundaries) - 1

    def __getitem__(self, i: int) -> list[dict]:
        rows = self._samples[int(self._boundaries[i]): int(self._boundaries[i + 1])]
        out, total = [], 0
        for path_id, sample_idx, c0, c1, t0, t1 in rows.tolist():
            if c0 != -1 or c1 != -1:
                raise NotImplementedError(
                    "char-sliced (LongText) preset entries are not supported; "
                    "pre-split long documents at tokenize time instead")
            sample = self.datasets[self._path_to_ds[path_id]][sample_idx]
            n = sample["num_tokens"]
            t1 = n if t1 <= 0 else min(t1, n)
            take = t1 - t0
            if total + take > self.pack_max_length:
                if self.long_pack_strategy != "truncate":
                    raise ValueError(
                        f"pack {i} exceeds pack_max_length={self.pack_max_length}; "
                        "set long_pack_strategy='truncate'")
                take = self.pack_max_length - total
                t1 = t0 + take
            if take <= 0:
                continue
            out.append({
                "input_ids": sample["input_ids"][t0:t1],
                "labels": sample["labels"][t0:t1],
                "num_tokens": take,
            })
            total += take
        if total < self.pack_max_length:
            if self.short_pack_strategy == "padding":
                pad = self.pack_max_length - total
                out.append({
                    "input_ids": np.full(pad, self.pad_token_id, np.int64),
                    "labels": np.full(pad, -100, np.int64),
                    "num_tokens": pad,
                    "is_padding": True,
                })
            elif self.short_pack_strategy != "ignore":
                raise ValueError(
                    f"pack {i} has {total} < pack_max_length={self.pack_max_length} "
                    "tokens; set short_pack_strategy='padding'")
        return out


class HybridMLLMPackDataset:
    """Mixed text + VLM corpora: text datasets go through exact HardPack
    (documents may split), VLM datasets through SoftPack (tiles must never
    split across rows); packs concatenated. Reference packing.py:666
    (MLLMPretrainHybridPackDataset routing Jsonl->Hard, VLMJsonl->ExpandSoft).

    A dataset is VLM if its tokenize_fn sets `is_vlm = True` (InternVL /
    Qwen3VL tokenize fns do) or the dataset itself carries `is_vlm`.
    """

    def __init__(self, datasets: Sequence, pack_max_length: int = 16384,
                 seed: int = 0, balance: str = "none"):
        text, vlm = [], []
        for ds in datasets:
            if getattr(ds, "is_vlm", False) or getattr(
                    getattr(ds, "tokenize_fn", None), "is_vlm", False):
                vlm.append(ds)
            else:
                text.append(ds)
        self.parts: list = []
        if text:
            self.parts.append(HardPackDataset(text, pack_max_length, seed))
        if vlm:
            self.parts.append(SoftPackDataset(vlm, pack_max_length, seed, balance=balance))
        if not self.parts:
            raise ValueError("no datasets provided")
        self._lens = [len(p) for p in self.parts]

    def __len__(self) -> int:
        return sum(self._lens)

    def __getitem__(self, i: int) -> list[dict]:
        for p, n in zip(self.parts, self._lens):
            if i < n:
                return p[i]
            i -= n
        raise IndexError(i)
