"""Paged engine sampling-state parity vs the dense engine.

Penalties (device-resident seen/count rows), min_tokens suppression,
top_logprobs, and stop_token_ids must behave exactly like the dense
engine's loop (generate.py:340-391) — greedy + penalties is deterministic,
so token-for-token equality is required."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.paged_generate import PagedGenerator
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params

PROMPTS = [[5, 6, 7, 8, 9], [11, 12, 13]]


def _model():
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    return model, params


def _compare(g):
    model, params = _model()
    arr = np.zeros((2, 5), np.int32)
    arr[0] = PROMPTS[0]
    arr[1, 2:] = PROMPTS[1]
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0, return_logprobs=True)
    pg = PagedGenerator(model, params, g, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in PROMPTS])
    eos = 198
    for i in range(2):
        d = list(dense["generated"][i])
        if eos in d:
            d = d[: d.index(eos) + 1]
        else:
            for t in g.stop_token_ids:
                if t in d:
                    d = d[: d.index(t) + 1]
                    break
        p = outs[i]["token_ids"]
        assert p[: len(d)] == d, (i, p, d)
    return dense, outs


def test_repetition_presence_frequency_penalties():
    _compare(GenerateConfig(
        max_new_tokens=12, do_sample=False, temperature=0.0,
        eos_token_id=198, max_length=256, paged_max_batch=4,
        paged_block_size=16, repetition_penalty=1.3, presence_penalty=0.6,
        frequency_penalty=0.4))


def test_min_tokens_suppresses_eos():
    g = GenerateConfig(
        max_new_tokens=10, do_sample=False, temperature=0.0,
        eos_token_id=198, max_length=256, paged_max_batch=4,
        paged_block_size=16, min_tokens=6,
        # +100 bias would otherwise force eos at step 1
        logit_bias={198: 100.0})
    model, params = _model()
    pg = PagedGenerator(model, params, g, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": PROMPTS[0]}])
    toks = outs[0]["token_ids"]
    # eos becomes reachable only after min_tokens generations
    assert len(toks) == 7 and toks[-1] == 198
    assert all(t != 198 for t in toks[:-1])


def test_stop_token_ids_halt_paged():
    g = GenerateConfig(
        max_new_tokens=10, do_sample=False, temperature=0.0,
        eos_token_id=198, max_length=256, paged_max_batch=4,
        paged_block_size=16, stop_token_ids=[42], logit_bias={42: 100.0})
    model, params = _model()
    pg = PagedGenerator(model, params, g, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": PROMPTS[0]}])
    assert outs[0]["token_ids"] == [42]
    assert outs[0]["finish_reason"] == "stop"


def test_top_logprobs_match_dense():
    g = GenerateConfig(
        max_new_tokens=8, do_sample=False, temperature=0.0,
        eos_token_id=198, max_length=256, paged_max_batch=4,
        paged_block_size=16, top_logprobs=3)
    dense, outs = _compare(g)
    # first generated position's top-3 alternative ids must agree
    for i in range(2):
        d_ids = np.asarray(dense["top_logprob_ids"][i][0])
        p_ids = np.asarray(outs[i]["top_logprob_ids"][0])
        np.testing.assert_array_equal(p_ids, d_ids)


def test_penalized_slot_reuse_resets_state():
    """A freed slot's penalty rows must not leak into the next request."""
    g = GenerateConfig(
        max_new_tokens=6, do_sample=False, temperature=0.0,
        eos_token_id=198, max_length=256, paged_max_batch=1,
        paged_block_size=16, repetition_penalty=1.5)
    model, params = _model()
    pg = PagedGenerator(model, params, g, max_batch=1, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    a1 = pg.generate([{"prompt_ids": PROMPTS[0]}])[0]["token_ids"]
    _ = pg.generate([{"prompt_ids": PROMPTS[1]}])  # dirties the slot
    a2 = pg.generate([{"prompt_ids": PROMPTS[0]}])[0]["token_ids"]
    assert a1 == a2
