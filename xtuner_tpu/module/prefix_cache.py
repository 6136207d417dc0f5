"""Automatic prefix caching (APC) for the paged rollout/serving engine.

Reference rollouts delegate to vLLM/LMDeploy/SGLang engines
(xtuner/v1/rl/rollout/worker.py:510 + lmdeploy.py/vllm.py/sglang.py), whose
headline serving feature beyond paging is content-addressed prefix reuse
(vLLM "automatic prefix caching", SGLang's radix cache): when a new request's
prompt starts with token blocks the engine has already computed — the
previous turn of a multi-turn chat, a shared system prompt, a repeated
few-shot header — their KV is reused instead of re-prefilled.

TPU redesign: the unit of reuse is the paged pool BLOCK (module/kv_cache.py),
addressed by a chained content hash over block-aligned token runs
(h_i = H(h_{i-1} || tokens_of_block_i)), so physical blocks from different
sequences with identical prefixes are interchangeable. The cache itself is a
plain host-side dict holding one allocator reference per cached block; the
device never sees it. Reuse is exact: KV depends only on (params, token ids,
positions), and a cached prefix is by construction the same tokens at the
same positions 0..C-1.

Eviction is LRU over chain leaves (an interior block is never evicted before
its children — a child is unreachable without its parent), driven on demand
by the allocator's reclaim hook when a fresh allocation would otherwise
exhaust the pool. A weight update invalidates everything (`flush`).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

from .kv_cache import PagedAllocator

_SEED = b"xtuner-tpu-apc-v1"


def _chain(prev: bytes, tokens) -> bytes:
    return hashlib.sha1(prev + np.asarray(tokens, np.int64).tobytes()).digest()


class PrefixCache:
    """Content-addressed index over retained paged-KV blocks.

    Entries: chain_hash -> [block_id, parent_hash | None, n_children,
    last_use]. Each entry holds ONE allocator reference on its block; lookup
    hands the requester additional references (the caller releases them via
    the normal sequence-release path)."""

    def __init__(self, allocator: PagedAllocator, block_size: int):
        self.allocator = allocator
        self.block_size = block_size
        self.entries: dict[bytes, list] = {}
        self._tick = 0
        # counters (surfaced on /metrics)
        self.lookups = 0
        self.hits = 0
        self.cached_tokens = 0  # total prefix tokens served from cache
        allocator.reclaim = self._reclaim

    # ------------------------------------------------------------- queries
    def __len__(self) -> int:
        return len(self.entries)

    def lookup(self, tokens, max_tokens: int) -> list[int]:
        """Longest cached block-chain prefix of `tokens`, capped at
        `max_tokens` (callers cap at p_len-1 so at least one tail token is
        left to prefill and produce last-position logits). Returns block ids
        with one fresh reference each (caller owns them)."""
        self.lookups += 1
        self._tick += 1
        n = min(len(tokens), max_tokens) // self.block_size
        h, out = _SEED, []
        for i in range(n):
            h = _chain(h, tokens[i * self.block_size:(i + 1) * self.block_size])
            ent = self.entries.get(h)
            if ent is None:
                break
            ent[3] = self._tick
            out.append(ent[0])
        if out:
            self.allocator.share(out)
            self.hits += 1
            self.cached_tokens += len(out) * self.block_size
        return out

    # ------------------------------------------------------------- updates
    def insert(self, tokens, blocks: list[int]) -> None:
        """Retain a finished sequence's full blocks under their chain hashes.
        tokens: everything written to the pool (prompt + generated KV);
        blocks: the sequence's block table (still referenced by the caller —
        insert takes its OWN reference per newly cached block; duplicates of
        already-cached chains are skipped, keeping the incumbent block)."""
        self._tick += 1
        h, parent = _SEED, None
        for i in range(len(tokens) // self.block_size):
            h = _chain(h, tokens[i * self.block_size:(i + 1) * self.block_size])
            ent = self.entries.get(h)
            if ent is None:
                self.allocator.share([blocks[i]])
                self.entries[h] = [blocks[i], parent, 0, self._tick]
                if parent is not None:
                    self.entries[parent][2] += 1
            else:
                ent[3] = self._tick
            parent = h

    def flush(self) -> None:
        """Drop everything (weight update: cached KV is stale)."""
        for ent in self.entries.values():
            self.allocator.release([ent[0]])
        self.entries.clear()

    # ------------------------------------------------------------ eviction
    def _reclaim(self, n_needed: int) -> None:
        """Allocator shortfall hook: evict LRU leaves until `n_needed`
        blocks became free (a cached block only frees if no live sequence
        still references it) or nothing is evictable."""
        freed = 0
        while freed < n_needed and self.entries:
            leaves = sorted((ent[3], h) for h, ent in self.entries.items()
                            if ent[2] == 0)
            if not leaves:  # cycle-free by construction; just in case
                return
            # prefer LRU leaves whose block actually frees (only the cache
            # holds it); fall back to the LRU leaf regardless, to unlock its
            # ancestors (the block stays alive with its live sequence and is
            # re-inserted when that sequence finishes)
            pick = next((h for _, h in leaves
                         if self.allocator.refcount[self.entries[h][0]] == 1),
                        leaves[0][1])
            ent = self.entries.pop(pick)
            if ent[1] is not None and ent[1] in self.entries:
                self.entries[ent[1]][2] -= 1
            if self.allocator.refcount[ent[0]] == 1:
                freed += 1
            self.allocator.release([ent[0]])
