"""PrefixCache (module/prefix_cache.py): content-addressed block reuse —
the TPU analog of vLLM automatic prefix caching / SGLang radix cache
(reference rollouts get this from their serving engines,
xtuner/v1/rl/rollout/worker.py:510)."""

import numpy as np

from xtuner_tpu.module.kv_cache import PagedAllocator
from xtuner_tpu.module.prefix_cache import PrefixCache


BS = 4


def _mk(num_blocks=16):
    alloc = PagedAllocator(num_blocks, BS)
    return alloc, PrefixCache(alloc, BS)


def test_insert_lookup_roundtrip():
    alloc, pc = _mk()
    toks = list(range(11))  # 2 full blocks + ragged tail
    blocks = alloc.alloc(3)
    pc.insert(toks, blocks)
    assert len(pc) == 2  # only full blocks cached
    # cache holds one ref each; sequence refs still live
    assert alloc.refcount[blocks[0]] == 2 and alloc.refcount[blocks[2]] == 1
    alloc.release(blocks)  # sequence finishes

    got = pc.lookup(toks, max_tokens=len(toks) - 1)
    assert got == blocks[:2]
    assert alloc.refcount[blocks[0]] == 2  # cache ref + requester ref
    # a diverging prompt shares only the common chain
    other = [0, 1, 2, 3] + [99] * 8
    assert pc.lookup(other, max_tokens=len(other) - 1) == blocks[:1]


def test_max_tokens_caps_reuse():
    alloc, pc = _mk()
    toks = list(range(8))
    blocks = alloc.alloc(2)
    pc.insert(toks, blocks)
    # identical prompt: cap at p_len-1 leaves the last block unfetched
    assert pc.lookup(toks, max_tokens=7) == blocks[:1]


def test_duplicate_insert_keeps_incumbent():
    alloc, pc = _mk()
    toks = list(range(8))
    b1 = alloc.alloc(2)
    pc.insert(toks, b1)
    b2 = alloc.alloc(2)  # a sibling with identical content, different blocks
    pc.insert(toks, b2)
    assert len(pc) == 2
    assert pc.lookup(toks, 100) == b1  # incumbent wins
    assert alloc.refcount[b2[0]] == 1  # no cache ref taken on the duplicate


def test_reclaim_evicts_lru_leaves_first():
    alloc, pc = _mk(num_blocks=4)
    a = alloc.alloc(2)
    pc.insert(list(range(8)), a)
    alloc.release(a)  # only the cache holds them now
    b = alloc.alloc(2)
    pc.insert([9, 9, 9, 9, 8, 8, 8, 8], b)
    alloc.release(b)
    pc.lookup(list(range(8)), 100)  # touch chain A (and take refs)
    # pool is full (all 4 cached, chain A also requester-referenced);
    # allocating 2 must evict chain B (LRU), starting from its leaf
    got = alloc.alloc(2)
    assert set(got) == set(b)
    assert len(pc) == 2  # chain A survives


def test_parent_never_evicted_before_child():
    alloc, pc = _mk(num_blocks=2)
    a = alloc.alloc(2)
    pc.insert(list(range(8)), a)
    alloc.release(a)
    # need 1 block: the LEAF (block 2 of the chain) must go, not the root
    got = alloc.alloc(1)
    assert got == [a[1]]
    assert len(pc) == 1
    assert pc.lookup(list(range(8)), 100) == [a[0]]  # root still serves


def test_reclaim_skips_blocks_still_referenced():
    alloc, pc = _mk(num_blocks=4)
    a = alloc.alloc(2)
    pc.insert(list(range(8)), a)  # cache refs; seq refs STILL held (live)
    b = alloc.alloc(2)
    # pool exhausted; reclaim evicts the cache's entries but the blocks stay
    # owned by the live sequence — allocation must still fail
    try:
        alloc.alloc(1)
        raised = False
    except MemoryError:
        raised = True
    assert raised
    assert len(pc) == 0  # entries were dropped in the attempt
    assert alloc.refcount[a[0]] == 1  # live seq ref intact
    alloc.release(a)
    alloc.release(b)
    assert alloc.free_blocks == 4


def test_flush_releases_everything():
    alloc, pc = _mk()
    a = alloc.alloc(2)
    pc.insert(list(range(8)), a)
    alloc.release(a)
    pc.flush()
    assert len(pc) == 0
    assert alloc.free_blocks == 16


def test_counters():
    alloc, pc = _mk()
    a = alloc.alloc(2)
    pc.insert(list(range(8)), a)
    pc.lookup(list(range(8)), 100)
    pc.lookup([55, 56, 57, 58], 100)  # miss
    assert pc.lookups == 2 and pc.hits == 1
    assert pc.cached_tokens == 2 * BS
