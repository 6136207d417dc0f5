"""Offset-indexed JSONL dataset with on-disk tokenization cache.

Reference: xtuner/v1/datasets/jsonl.py (JsonlDataset :256 — offset index,
parallel token counting, npy cache keyed by tokenizer/fn hash, sample_ratio).
Host-side and torch-free. Tokenization is lazy per item; `num_tokens` for the
packer is precomputed once and cached as .npy next to a configurable cache dir.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()


class JsonlDataset:
    def __init__(self, path: str | Path, tokenize_fn: Callable[[dict], dict],
                 cache_dir: Optional[str | Path] = None, sample_ratio: float = 1.0,
                 name: str = ""):
        self.path = Path(path)
        self.tokenize_fn = tokenize_fn
        self.sample_ratio = sample_ratio
        self.name = name or self.path.stem
        self._offsets = self._build_offsets()
        self._file = None
        self._num_tokens: Optional[np.ndarray] = None
        self._cache_dir = Path(cache_dir) if cache_dir else None

    def _build_offsets(self) -> np.ndarray:
        offsets = [0]
        with open(self.path, "rb") as f:
            for line in f:
                offsets.append(offsets[-1] + len(line))
        return np.asarray(offsets[:-1], dtype=np.int64)

    def __len__(self) -> int:
        n = len(self._offsets)
        return int(n * self.sample_ratio) if self.sample_ratio != 1.0 else n

    def _read_line(self, i: int) -> dict:
        i = i % len(self._offsets)
        if self._file is None:
            self._file = open(self.path, "rb")
        self._file.seek(self._offsets[i])
        return json.loads(self._file.readline())

    def __getitem__(self, i: int) -> dict:
        item = self._read_line(i)
        return self.tokenize_fn(item)

    def raw_item(self, i: int) -> dict:
        return self._read_line(i)

    # ------------------------------------------------------------------
    def _cache_key(self) -> str:
        fn_hash = self.tokenize_fn.hash() if hasattr(self.tokenize_fn, "hash") else "nohash"
        stat = self.path.stat()
        key = f"{self.path}:{stat.st_size}:{stat.st_mtime_ns}:{fn_hash}"
        return hashlib.sha256(key.encode()).hexdigest()[:16]

    @property
    def num_tokens(self) -> np.ndarray:
        """Per-sample token counts (drives the packer)."""
        if self._num_tokens is not None:
            return self._num_tokens
        cache_path = None
        if self._cache_dir is not None:
            self._cache_dir.mkdir(parents=True, exist_ok=True)
            cache_path = self._cache_dir / f"{self.name}-{self._cache_key()}.npy"
            if cache_path.exists():
                self._num_tokens = np.load(cache_path)
                if len(self._num_tokens) == len(self._offsets):
                    return self._num_tokens
        logger.info(f"[dataset {self.name}] counting tokens for {len(self._offsets)} samples")
        counts = np.asarray(
            [self.tokenize_fn(self._read_line(i))["num_tokens"] for i in range(len(self._offsets))],
            dtype=np.int64,
        )
        if cache_path is not None:
            np.save(cache_path, counts)
        self._num_tokens = counts
        return counts

    # pickling across dataloader workers: drop the open file handle
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_file"] = None
        return state
