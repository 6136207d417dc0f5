"""Chunked prefill (GenerateConfig.prefill_chunk): long prompts load one
chunk per tick so in-flight decodes keep ticking — outputs must be
IDENTICAL to whole-bucket prefill (same math, different schedule)."""

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


def _model():
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    return model, init_params(model.param_specs(), jax.random.key(0))


def _gen(chunk):
    return GenerateConfig(max_new_tokens=8, do_sample=False, temperature=0.0,
                          eos_token_id=198, max_length=512, paged_max_batch=4,
                          paged_block_size=16, prefill_chunk=chunk)


LONG = list(range(3, 3 + 150))  # crosses several 64-token buckets
SHORT = [7, 8, 9]


def test_chunked_matches_whole_bucket_greedy():
    model, params = _model()
    ref = PagedGenerator(model, params, _gen(0), max_batch=4, block_size=16,
                         compute_dtype=jnp.float32, pad_token_id=0)
    out_ref = ref.generate([{"prompt_ids": LONG}, {"prompt_ids": SHORT}])
    pg = PagedGenerator(model, params, _gen(64), max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    out = pg.generate([{"prompt_ids": LONG}, {"prompt_ids": SHORT}])
    assert pg._chunked_prefills >= 3  # 150 tokens / 64-chunk = 3 chunks
    for r, o in zip(out_ref, out):
        assert o["token_ids"] == r["token_ids"]
        assert o["finish_reason"] == r["finish_reason"]
    # no leaks: every ref is the trash block or a prefix-cache entry
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks


def test_chunk_size_not_dividing_bucket():
    """Regression: a chunk size that does not divide the prompt bucket used
    to clamp the final chunk's dynamic_update_slice start, silently
    overwriting earlier prefix KV (prompt 150, chunk 128 -> bucket 192; the
    second chunk's write start clamped from 128 to 64)."""
    model, params = _model()
    ref = PagedGenerator(model, params, _gen(0), max_batch=4, block_size=16,
                         compute_dtype=jnp.float32, pad_token_id=0)
    out_ref = ref.generate([{"prompt_ids": LONG}])
    pg = PagedGenerator(model, params, _gen(128), max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    out = pg.generate([{"prompt_ids": LONG}])
    assert out[0]["token_ids"] == out_ref[0]["token_ids"]


def test_short_prompts_skip_chunking():
    model, params = _model()
    pg = PagedGenerator(model, params, _gen(64), max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    out = pg.generate([{"prompt_ids": SHORT}])
    assert pg._chunked_prefills == 0
    assert out[0]["token_ids"]


def test_decode_interleaves_with_chunked_prefill():
    """A short request admitted BEFORE a long prompt keeps producing tokens
    while the long prompt prefills chunk-by-chunk."""
    model, params = _model()
    pg = PagedGenerator(model, params, _gen(64), max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    eng = AsyncPagedEngine(pg)
    try:
        f_short = eng.submit({"prompt_ids": SHORT, "max_new_tokens": 8})
        f_long = eng.submit({"prompt_ids": LONG, "max_new_tokens": 8})
        short = f_short.result(timeout=120)
        long_ = f_long.result(timeout=120)
    finally:
        eng.stop()
    assert pg._chunked_prefills >= 3
    ref = PagedGenerator(model, params, _gen(0), max_batch=2, block_size=16,
                         compute_dtype=jnp.float32, pad_token_id=0)
    out_ref = ref.generate([{"prompt_ids": SHORT}, {"prompt_ids": LONG}])
    assert short["token_ids"] == out_ref[0]["token_ids"]
    assert long_["token_ids"] == out_ref[1]["token_ids"]


def test_chunked_group_joins_after_leader_completes():
    model, params = _model()
    pg = PagedGenerator(model, params, _gen(64), max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": LONG, "group": "g"}
                        for _ in range(3)])
    assert outs[0]["token_ids"] == outs[1]["token_ids"] == outs[2]["token_ids"]
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks
