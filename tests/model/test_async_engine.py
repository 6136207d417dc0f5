"""AsyncPagedEngine: concurrent submits share one batched decode loop.

The vLLM AsyncLLMEngine analog (docs/serving.md). Checks: greedy results
match the synchronous engine exactly, late submits join in-flight decoding,
concurrent threads all complete, errors poison waiters, idle loop blocks."""

import threading
import time

import jax
import jax.numpy as jnp
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.async_engine import AsyncPagedEngine
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.model.paged_generate import PagedGenerator
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params


def _pg(max_batch=4):
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=198, max_length=256,
                       paged_max_batch=max_batch, paged_block_size=16)
    return PagedGenerator(model, params, g, max_batch=max_batch,
                          block_size=16, compute_dtype=jnp.float32,
                          pad_token_id=0)


PROMPTS = [[5, 6, 7, 8, 9], [11, 12, 13], [20, 21], [30, 31, 32, 33]]


def test_async_matches_sync_greedy():
    ref = _pg().generate([{"prompt_ids": p} for p in PROMPTS])
    eng = AsyncPagedEngine(_pg())
    try:
        out = eng.generate([{"prompt_ids": p} for p in PROMPTS])
    finally:
        eng.stop()
    for r, o in zip(ref, out):
        assert o["token_ids"] == r["token_ids"]
        assert o["finish_reason"] == r["finish_reason"]


def test_concurrent_submits_from_threads():
    """N threads submit while the loop is mid-flight; every request gets its
    own correct greedy result (same as a fresh synchronous run)."""
    ref = {tuple(p): o["token_ids"]
           for p, o in zip(PROMPTS,
                           _pg().generate([{"prompt_ids": p}
                                           for p in PROMPTS]))}
    eng = AsyncPagedEngine(_pg(max_batch=2))  # fewer slots than requests
    results = {}
    errs = []

    def run(p):
        try:
            results[tuple(p)] = eng.submit(
                {"prompt_ids": p}).result(timeout=120)["token_ids"]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(p,)) for p in PROMPTS]
    for i, t in enumerate(threads):
        t.start()
        if i == 1:
            time.sleep(0.05)  # stagger: later submits join mid-flight
    for t in threads:
        t.join(timeout=120)
    try:
        assert not errs
        assert results == ref
    finally:
        eng.stop()


def test_idle_engine_blocks_then_wakes():
    eng = AsyncPagedEngine(_pg())
    try:
        time.sleep(0.1)  # loop should be parked on the condvar
        out = eng.submit({"prompt_ids": [9, 8, 7]}).result(timeout=120)
        assert out["token_ids"]
        time.sleep(0.05)
        out2 = eng.submit({"prompt_ids": [9, 8, 7]}).result(timeout=120)
        assert out2["token_ids"] == out["token_ids"]  # state fully reset
    finally:
        eng.stop()


def test_submit_after_stop_raises():
    eng = AsyncPagedEngine(_pg())
    eng.stop()
    with pytest.raises(RuntimeError):
        eng.submit({"prompt_ids": [1, 2]})
