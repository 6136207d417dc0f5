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


def test_preset_pack_roundtrip(corpus, tmp_path):
    from xtuner_tpu.datasets.packing import PresetPackDataset, save_pack_config

    path, lens = corpus
    ds = JsonlDataset(path, CountingTokenizeFn(), num_proc=1)
    # two packs: [s0 full, s1[:5]] and [s2 sliced 1:4, pad]
    n0, n2 = int(lens[0]), int(lens[2])
    samples = np.array([
        [0, 0, -1, -1, 0, 0],           # sample 0, full
        [0, 1, -1, -1, 0, 5],           # sample 1, first 5 tokens
        [0, 2, -1, -1, 1, min(4, n2)],  # sample 2, token slice
    ], np.int64)
    boundaries = np.array([0, 2, 3], np.int64)
    cfg_dir = tmp_path / "pack_cfg"
    save_pack_config(cfg_dir, boundaries, samples, [str(ds.path)])

    pml = n0 + 5
    pp = PresetPackDataset([ds], cfg_dir, pack_max_length=pml,
                           short_pack_strategy="padding")
    assert len(pp) == 2
    pack0 = pp[0]
    assert [s["num_tokens"] for s in pack0] == [n0, 5]
    np.testing.assert_array_equal(pack0[1]["input_ids"], np.arange(5))
    pack1 = pp[1]
    take = min(4, n2) - 1
    assert pack1[0]["num_tokens"] == take
    np.testing.assert_array_equal(pack1[0]["input_ids"], np.arange(1, 1 + take))
    assert pack1[-1].get("is_padding") and sum(s["num_tokens"] for s in pack1) == pml


def test_preset_pack_strategies(corpus, tmp_path):
    from xtuner_tpu.datasets.packing import PresetPackDataset, save_pack_config

    path, lens = corpus
    ds = JsonlDataset(path, CountingTokenizeFn(), num_proc=1)
    samples = np.array([[0, 0, -1, -1, 0, 0]], np.int64)
    cfg_dir = tmp_path / "pack_cfg2"
    save_pack_config(cfg_dir, np.array([0, 1], np.int64), samples, [str(ds.path)])
    n0 = int(lens[0])
    with pytest.raises(ValueError, match="short_pack_strategy"):
        PresetPackDataset([ds], cfg_dir, pack_max_length=n0 + 10)[0]
    with pytest.raises(ValueError, match="long_pack_strategy"):
        PresetPackDataset([ds], cfg_dir, pack_max_length=n0 - 1)[0]
    trunc = PresetPackDataset([ds], cfg_dir, pack_max_length=n0 - 1,
                              long_pack_strategy="truncate",
                              short_pack_strategy="ignore")[0]
    assert sum(s["num_tokens"] for s in trunc) == n0 - 1


def test_hybrid_mllm_pack_routing(corpus, tmp_path):
    from xtuner_tpu.datasets.packing import (
        HardPackDataset, HybridMLLMPackDataset, SoftPackDataset)

    path, lens = corpus
    text_ds = JsonlDataset(path, CountingTokenizeFn(), num_proc=1)

    class VLMTokenizeFn(CountingTokenizeFn):
        is_vlm = True

        def hash(self):
            return "vlm-counting-v1"

    vlm_path = tmp_path / "vlm.jsonl"
    with open(vlm_path, "w") as f:
        for n in [30, 40, 50]:
            f.write(json.dumps({"text": "y" * n}) + "\n")
    vlm_ds = JsonlDataset(vlm_path, VLMTokenizeFn(), num_proc=1)

    hybrid = HybridMLLMPackDataset([text_ds, vlm_ds], pack_max_length=128, seed=0)
    # text routed to exact hard-pack, vlm to soft-pack, concatenated
    assert len(hybrid.parts) == 2
    assert isinstance(hybrid.parts[0], HardPackDataset)
    assert isinstance(hybrid.parts[1], SoftPackDataset)
    assert len(hybrid) == len(hybrid.parts[0]) + len(hybrid.parts[1])
    # hard packs are exact-length; soft packs never split a sample
    assert sum(s["num_tokens"] for s in hybrid[0]) == 128
    soft0 = hybrid[len(hybrid.parts[0])]
    assert all(s["num_tokens"] in (30, 40, 50) for s in soft0)


def test_preset_sampler(tmp_path):
    from xtuner_tpu.datasets.sampler import PresetSampler

    order = np.array([2, 0, 1, 2, 1, 0, 2], np.int64)
    path = tmp_path / "order.npy"
    np.save(path, order)
    s = PresetSampler(str(path), dataset_len=3, round_to=2)
    assert len(s) == 6  # rounded down from 7
    got = list(s)
    assert got == [2, 0, 1, 2, 1, 0]
    # resume mid-stream
    s2 = PresetSampler(str(path), dataset_len=3, round_to=2)
    it = iter(s2)
    next(it); next(it)
    state = s2.get_state_dict()
    s3 = PresetSampler(str(path), dataset_len=3, round_to=2)
    s3.load_state_dict(state)
    assert list(s3) == got[2:]
    # out-of-range validation
    np.save(path, np.array([5], np.int64))
    with pytest.raises(ValueError, match="out of range"):
        PresetSampler(str(path), dataset_len=3)
