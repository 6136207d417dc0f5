"""Sampling-parameter parity with the reference SampleParams surface
(rl_data.py:25-45): repetition/presence/frequency penalties, min_tokens,
stop_token_ids."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import (GenerateConfig, _apply_penalties,
                                       _suppress_stops, generate,
                                       penalties_active)
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params


def test_penalty_math():
    logits = jnp.asarray([[2.0, -2.0, 1.0, 0.0]])
    seen = jnp.asarray([[True, True, False, False]])
    counts = jnp.asarray([[3, 0, 1, 0]], jnp.int32)
    cfg = GenerateConfig(repetition_penalty=2.0, presence_penalty=0.5,
                         frequency_penalty=0.1)
    out = np.asarray(_apply_penalties(logits, cfg, seen, counts))[0]
    # repetition: 2.0/2 = 1.0 (pos), -2.0*2 = -4.0 (neg); then presence+freq
    np.testing.assert_allclose(out, [1.0 - 0.5 - 0.3, -4.0, 1.0 - 0.5 - 0.1, 0.0],
                               rtol=1e-6)


def test_min_tokens_suppresses_terminators():
    cfg = GenerateConfig(min_tokens=3, stop_token_ids=[2])
    logits = jnp.zeros((1, 5))
    early = np.asarray(_suppress_stops(logits, cfg, jnp.int32(1), eos=4))[0]
    assert early[4] == -np.inf and early[2] == -np.inf and early[0] == 0.0
    late = np.asarray(_suppress_stops(logits, cfg, jnp.int32(3), eos=4))[0]
    assert np.isfinite(late).all()


def _model():
    cfg = DenseConfig(
        vocab_size=60, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=50,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    return cfg, model, params


def test_repetition_penalty_reduces_repeats_end_to_end():
    cfg, model, params = _model()
    prompts = np.asarray([[5, 6, 7, 8]], np.int32)

    def run(rp):
        g = GenerateConfig(max_new_tokens=24, do_sample=False, temperature=0.0,
                           eos_token_id=50, repetition_penalty=rp)
        out = generate(model, params, prompts, g, compute_dtype=jnp.float32,
                       pad_token_id=0)
        toks = [t for t in out["generated"][0].tolist() if t != 50]
        return toks

    plain = run(1.0)
    pen = run(5.0)
    # greedy tiny models loop hard; a strong repetition penalty must strictly
    # increase distinctness
    assert len(set(pen)) > len(set(plain)) or len(set(plain)) == len(plain)
    assert penalties_active(GenerateConfig(repetition_penalty=5.0))


def test_min_tokens_and_stop_ids_end_to_end():
    cfg, model, params = _model()
    prompts = np.asarray([[5, 6, 7, 8]], np.int32)
    g0 = GenerateConfig(max_new_tokens=12, do_sample=False, temperature=0.0,
                        eos_token_id=50)
    base = generate(model, params, prompts, g0, compute_dtype=jnp.float32,
                    pad_token_id=0)["generated"][0].tolist()
    # force an early terminator: whatever the greedy model emits first becomes
    # a stop id; min_tokens must delay termination past it
    stop = base[0]
    g1 = GenerateConfig(max_new_tokens=12, do_sample=False, temperature=0.0,
                        eos_token_id=50, stop_token_ids=[stop])
    out1 = generate(model, params, prompts, g1, compute_dtype=jnp.float32,
                    pad_token_id=0)["generated"][0].tolist()
    # terminated right after the stop id: everything after is eos fill
    assert out1[0] == stop and all(t == 50 for t in out1[1:])
    g2 = GenerateConfig(max_new_tokens=12, do_sample=False, temperature=0.0,
                        eos_token_id=50, stop_token_ids=[stop], min_tokens=4)
    out2 = generate(model, params, prompts, g2, compute_dtype=jnp.float32,
                    pad_token_id=0)["generated"][0].tolist()
    assert stop not in out2[:4] and 50 not in out2[:4]


def test_top_logprobs_end_to_end():
    cfg, model, params = _model()
    prompts = np.asarray([[5, 6, 7, 8]], np.int32)
    g = GenerateConfig(max_new_tokens=4, do_sample=False, temperature=0.0,
                       eos_token_id=50, top_logprobs=3)
    out = generate(model, params, prompts, g, compute_dtype=jnp.float32,
                   pad_token_id=0, return_logprobs=True)
    assert out["top_logprobs"].shape == (1, 4, 3)
    assert out["top_logprob_ids"].shape == (1, 4, 3)
    # greedy: the sampled token is the #1 alternative with matching logprob
    np.testing.assert_array_equal(out["top_logprob_ids"][0, :, 0],
                                  out["generated"][0])
    np.testing.assert_allclose(out["top_logprobs"][0, :, 0],
                               out["logprobs"][0], rtol=1e-6)
    # descending order
    assert (np.diff(out["top_logprobs"][0], axis=-1) <= 0).all()


def test_worker_top_logprobs_wire():
    from xtuner_tpu.rl.transport import ParamStore
    from xtuner_tpu.rl.worker import RolloutWorker

    cfg, model, params = _model()
    w = RolloutWorker(cfg, gen_cfg=GenerateConfig(
        max_new_tokens=4, do_sample=False, temperature=0.0, eos_token_id=50),
        compute_dtype=jnp.float32, pad_token_id=0,
        param_store=ParamStore(params))
    resp = w.complete({"prompt_ids": [[5, 6, 7]], "logprobs": True,
                       "top_logprobs": 2})
    lp = resp["choices"][0]["logprobs"]
    assert "top_logprobs" in lp and len(lp["top_logprobs"]) == len(lp["token_logprobs"])
    assert all(len(d) == 2 for d in lp["top_logprobs"])
