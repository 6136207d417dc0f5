"""Automatic prefix caching on the paged engine: multi-turn prompts reuse
the previous turn's KV blocks (content-addressed, exact), matching the
serving engines the reference delegates to (vLLM APC / SGLang radix cache,
xtuner/v1/rl/rollout/worker.py:510). Outputs must be IDENTICAL to an engine
with prefix_cache=False — reuse is bit-exact restore, not approximation."""

import jax
import jax.numpy as jnp
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.model.paged_generate import PagedGenerator
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params

BS = 16  # paged block size used throughout


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


def _mla_model():
    from xtuner_tpu.model.moe import MoEConfig
    from xtuner_tpu.module.mla import MLAConfig
    from xtuner_tpu.module.router import GreedyRouterConfig

    cfg = MoEConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, moe_intermediate_size=16,
        n_routed_experts=4, num_experts_per_tok=2, eos_token_id=198,
        router=GreedyRouterConfig(),
        attention=MLAConfig(num_attention_heads=4, q_lora_rank=16,
                            kv_lora_rank=16, qk_nope_head_dim=8,
                            qk_rope_head_dim=8, v_head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    return model, init_params(model.param_specs(), jax.random.key(0))


def _gen(apc=True, **kw):
    base = dict(max_new_tokens=8, do_sample=False, temperature=0.0,
                eos_token_id=198, max_length=512, paged_max_batch=4,
                paged_block_size=BS, prefix_cache=apc)
    base.update(kw)
    return GenerateConfig(**base)


def _pg(model, params, gen):
    return PagedGenerator(model, params, gen, max_batch=4, block_size=BS,
                          compute_dtype=jnp.float32, pad_token_id=0)


PROMPT = list(range(3, 3 + 40))


def _two_turns(pg):
    out1 = pg.generate([{"prompt_ids": PROMPT}])[0]
    turn2 = PROMPT + out1["token_ids"] + [5, 6, 7]
    out2 = pg.generate([{"prompt_ids": turn2}])[0]
    return out1, out2


def test_multi_turn_reuses_prefix_exactly():
    model, params = _model()
    ref1, ref2 = _two_turns(_pg(model, params, _gen(apc=False)))
    pg = _pg(model, params, _gen(apc=True))
    out1, out2 = _two_turns(pg)
    assert out1["token_ids"] == ref1["token_ids"]
    assert out2["token_ids"] == ref2["token_ids"]
    pc = pg.prefix_cache
    assert pc is not None and pc.hits == 1  # turn-2 lookup hit
    # turn 1 wrote 40 + 7 = 47 KV positions -> 2 full blocks reusable
    assert pc.cached_tokens == (47 // BS) * BS
    # blocks balance: trash block + retained cache entries only
    assert pg.cache.allocator.refcount.sum() == 1 + len(pc)


def test_same_prompt_repeat_hits():
    model, params = _model()
    pg = _pg(model, params, _gen(apc=True))
    a = pg.generate([{"prompt_ids": PROMPT}])[0]
    b = pg.generate([{"prompt_ids": PROMPT}])[0]
    assert a["token_ids"] == b["token_ids"]
    assert pg.prefix_cache.hits == 1
    # reuse capped at p_len-1: 40-token prompt -> 2 blocks (32 tokens)
    assert pg.prefix_cache.cached_tokens == 32


def test_apc_with_chunked_prefill():
    model, params = _model()
    long = list(range(3, 3 + 150))
    ref = _pg(model, params, _gen(apc=False))
    r1 = ref.generate([{"prompt_ids": long}])[0]
    r2 = ref.generate([{"prompt_ids": long + r1["token_ids"]}])[0]
    pg = _pg(model, params, _gen(apc=True, prefill_chunk=64))
    o1 = pg.generate([{"prompt_ids": long}])[0]
    o2 = pg.generate([{"prompt_ids": long + o1["token_ids"]}])[0]
    assert o1["token_ids"] == r1["token_ids"]
    assert o2["token_ids"] == r2["token_ids"]
    assert pg.prefix_cache.hits == 1


def test_apc_int8_pool_parity():
    model, params = _model()
    ref1, ref2 = _two_turns(
        _pg(model, params, _gen(apc=False, kv_cache_dtype="int8")))
    pg = _pg(model, params, _gen(apc=True, kv_cache_dtype="int8"))
    out1, out2 = _two_turns(pg)
    assert out1["token_ids"] == ref1["token_ids"]
    assert out2["token_ids"] == ref2["token_ids"]
    assert pg.prefix_cache.hits == 1


def test_apc_mla_parity():
    model, params = _mla_model()
    ref1, ref2 = _two_turns(_pg(model, params, _gen(apc=False)))
    pg = _pg(model, params, _gen(apc=True))
    out1, out2 = _two_turns(pg)
    assert out1["token_ids"] == ref1["token_ids"]
    assert out2["token_ids"] == ref2["token_ids"]
    assert pg.prefix_cache.hits == 1


def test_eviction_under_pool_pressure():
    """Distinct prompts keep filling the pool with retained blocks; the
    allocator's reclaim hook must evict LRU prefixes instead of raising."""
    model, params = _model()
    # max_length 512 / block 16 = 32 blocks; each request retains ~3
    pg = _pg(model, params, _gen(apc=True))
    ref = _pg(model, params, _gen(apc=False))
    for i in range(12):
        prompt = [(7 * i + j) % 150 + 3 for j in range(40)]
        out = pg.generate([{"prompt_ids": prompt}])[0]
        exp = ref.generate([{"prompt_ids": prompt}])[0]
        assert out["token_ids"] == exp["token_ids"]
    assert len(pg.prefix_cache) > 0  # retained something


def test_flush_invalidates():
    model, params = _model()
    pg = _pg(model, params, _gen(apc=True))
    pg.generate([{"prompt_ids": PROMPT}])
    assert len(pg.prefix_cache) > 0
    pg.request_prefix_flush()
    pg.generate([{"prompt_ids": PROMPT}])  # tick applies the flush first
    assert pg.prefix_cache.hits == 0
    # the post-flush request re-retained its blocks
    assert len(pg.prefix_cache) > 0


def test_group_rollouts_seed_the_cache():
    """A GRPO group's finished rollouts retain their prompt blocks; a later
    solo request with the same prompt hits."""
    model, params = _model()
    pg = _pg(model, params, _gen(apc=True))
    pg.generate([{"prompt_ids": PROMPT, "group": "g"} for _ in range(3)])
    out = pg.generate([{"prompt_ids": PROMPT}])[0]
    ref = _pg(model, params, _gen(apc=False)).generate(
        [{"prompt_ids": PROMPT}])[0]
    assert out["token_ids"] == ref["token_ids"]
    assert pg.prefix_cache.hits == 1


def test_hybrid_and_spec_auto_disable():
    model, params = _model()
    pg = _pg(model, params, _gen(apc=False))
    assert pg.prefix_cache is None
    pg2 = PagedGenerator(model, params, _gen(apc=True), max_batch=4,
                         block_size=BS, compute_dtype=jnp.float32,
                         pad_token_id=0, record_routing=True)
    assert pg2.prefix_cache is None  # routing replay wants raw prefills
