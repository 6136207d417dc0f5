"""Data-stack scale features: multi-process token counting and
compute-balanced (attention-FLOPs) soft packing."""

import json

import numpy as np
import pytest

from xtuner_tpu.datasets.jsonl import JsonlDataset
from xtuner_tpu.datasets.packing import SoftPackDataset, attention_flops_proxy


class CountingTokenizeFn:
    """Picklable tokenize fn: num_tokens = len(text)."""

    def __call__(self, item):
        n = len(item["text"])
        return {"input_ids": list(range(n)), "labels": list(range(n)), "num_tokens": n}

    def hash(self):
        return "counting-v1"


class PoisonedTokenizeFn(CountingTokenizeFn):
    """Same cache key as CountingTokenizeFn but crashes if actually called —
    proves the on-disk count cache was hit."""

    def __call__(self, item):
        raise AssertionError("token counting ran despite a warm cache")


@pytest.fixture
def corpus(tmp_path):
    path = tmp_path / "data.jsonl"
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 200, 103)
    with open(path, "w") as f:
        for n in lens:
            f.write(json.dumps({"text": "x" * int(n)}) + "\n")
    return path, lens


def test_parallel_count_matches_serial(corpus, tmp_path):
    path, lens = corpus
    ds_par = JsonlDataset(path, CountingTokenizeFn(), num_proc=4)
    ds_ser = JsonlDataset(path, CountingTokenizeFn(), num_proc=1)
    np.testing.assert_array_equal(ds_par.num_tokens, lens)
    np.testing.assert_array_equal(ds_ser.num_tokens, ds_par.num_tokens)


def test_parallel_count_uses_pool(corpus, monkeypatch):
    """The process pool actually runs (map called with the expected slices)."""
    path, lens = corpus
    import multiprocessing as mp

    calls = {}
    real_ctx = mp.get_context

    class SpyPool:
        def __init__(self, n):
            calls["n_procs"] = n
            self._pool = real_ctx("spawn").Pool(n)

        def map(self, fn, jobs):
            calls["n_jobs"] = len(jobs)
            return self._pool.map(fn, jobs)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._pool.terminate()

    class SpyCtx:
        def Pool(self, n):
            return SpyPool(n)

    monkeypatch.setattr(mp, "get_context", lambda kind: SpyCtx())
    ds = JsonlDataset(path, CountingTokenizeFn(), num_proc=4)
    np.testing.assert_array_equal(ds.num_tokens, lens)
    assert calls["n_procs"] == 4 and calls["n_jobs"] == 4


def test_count_cache_roundtrip(corpus, tmp_path):
    path, lens = corpus
    cache = tmp_path / "cache"
    ds = JsonlDataset(path, CountingTokenizeFn(), cache_dir=cache, num_proc=2)
    np.testing.assert_array_equal(ds.num_tokens, lens)
    assert list(cache.glob("*.npy"))
    # second dataset hits the cache (poisoned fn crashes if counting reruns)
    ds2 = JsonlDataset(path, PoisonedTokenizeFn(), cache_dir=cache, num_proc=2)
    np.testing.assert_array_equal(ds2.num_tokens, lens)


class _FakeDs:
    def __init__(self, lens):
        self.num_tokens = np.asarray(lens)

    def __getitem__(self, i):
        n = int(self.num_tokens[i])
        return {"input_ids": [1] * n, "labels": [1] * n, "num_tokens": n}


def test_flops_balanced_packing_reduces_variance():
    """Mixed-length corpus: flops balancing must cut per-pack FLOPs spread
    vs shuffled first-fit, keep capacity, and pack every sample once."""
    rng = np.random.default_rng(1)
    lens = rng.integers(32, 1500, 500)
    ds = _FakeDs(lens)
    pml = 4096
    base = SoftPackDataset([ds], pack_max_length=pml, seed=0, balance="none")
    bal = SoftPackDataset([ds], pack_max_length=pml, seed=0, balance="flops")

    # every sample exactly once
    def flat(p):
        return sorted(si for pack in p.packs for _, si in pack)

    assert flat(bal) == list(range(len(lens)))
    # capacity respected
    for pack in bal.packs:
        assert sum(int(ds.num_tokens[si]) for _, si in pack) <= pml
    assert bal.flops_cv() < base.flops_cv() * 0.75, (bal.flops_cv(), base.flops_cv())
    # similar pack count (balancing must not blow up padding)
    assert len(bal.packs) <= len(base.packs) * 1.1
    # per-pack flops recorded for the flops-grouped sampler
    assert len(bal.pack_flops) == len(bal.packs)


def test_flops_proxy_is_quadratic():
    assert attention_flops_proxy(100) == 4 * attention_flops_proxy(50)
