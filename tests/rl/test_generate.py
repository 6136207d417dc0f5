"""Engine-native generation: greedy determinism, eos stop, logprob consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params


def tiny_dense():
    return DenseConfig(
        vocab_size=64, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=2,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


def test_greedy_matches_full_forward():
    """Greedy decode tokens must equal argmax of the training forward's
    logits computed over the full generated sequence (cache correctness)."""
    cfg = tiny_dense()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    prompt = np.asarray([[5, 6, 7, 8]], np.int32)
    gen_cfg = GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=63)
    out = generate(model, params, prompt, gen_cfg, compute_dtype=jnp.float32,
                   pad_token_id=0)
    seq = out["sequences"][0]

    # replay: training forward over the full sequence, check each generated
    # token is the argmax of the previous position's logits
    ctx = SequenceContext.from_input_ids(seq[None, :])
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    logits = np.asarray(hidden @ model.lm_head_weight(params))
    for t in range(4, len(seq)):
        pred = int(np.argmax(logits[0, t - 1]))
        assert pred == int(seq[t]), f"mismatch at position {t}"


def test_left_padded_prompts_match_unpadded():
    """Many pads + logprob closeness: 2 pads with greedy argmax masked the
    decode kv_mask bug where generated tokens attended to pad KV slots
    (tokens only flip at ~10 pads; logprobs diverge much earlier)."""
    cfg = tiny_dense()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    gen_cfg = GenerateConfig(max_new_tokens=4, do_sample=False, eos_token_id=63)
    unpadded = generate(model, params, np.asarray([[5, 6, 7]], np.int32), gen_cfg,
                        compute_dtype=jnp.float32, pad_token_id=0,
                        return_logprobs=True)
    pads = 16
    padded = generate(model, params,
                      np.asarray([[0] * pads + [5, 6, 7]], np.int32), gen_cfg,
                      compute_dtype=jnp.float32, pad_token_id=0,
                      return_logprobs=True)
    np.testing.assert_array_equal(unpadded["generated"], padded["generated"])
    np.testing.assert_allclose(unpadded["logprobs"], padded["logprobs"],
                               rtol=1e-4, atol=1e-5)


def test_eos_stops_generation():
    cfg = tiny_dense()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(2))
    # force eos: token 2 is eos; bias lm head so eos dominates after embedding
    gen_cfg = GenerateConfig(max_new_tokens=8, do_sample=False, eos_token_id=2)
    params["lm_head"] = {"w": jnp.zeros((32, 64)).at[:, 2].set(100.0)}
    cfg2 = cfg.model_copy(update={"tie_word_embeddings": False})
    model2 = cfg2.build()
    out = generate(model2, params, np.asarray([[5, 6]], np.int32), gen_cfg,
                   compute_dtype=jnp.float32)
    gen = out["generated"][0]
    assert (gen == 2).all()


def test_moe_generate_runs():
    cfg = MoEConfig(
        vocab_size=64, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        eos_token_id=63,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(3))
    out = generate(model, params, np.asarray([[5, 6, 7]], np.int32),
                   GenerateConfig(max_new_tokens=4, do_sample=True, temperature=1.0),
                   compute_dtype=jnp.float32)
    assert out["sequences"].shape == (1, 7)


def test_sampled_logprobs_match_replay():
    """Rollout logprobs must match a teacher-forced recompute (the RL
    old-logprob contract)."""
    from xtuner_tpu.loss.ce_loss import per_token_logprobs

    cfg = tiny_dense()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(4))
    prompt = np.asarray([[5, 6, 7, 8]], np.int32)
    gen_cfg = GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=63)
    out = generate(model, params, prompt, gen_cfg, compute_dtype=jnp.float32,
                   return_logprobs=True)
    seq = out["sequences"]
    ctx = SequenceContext.from_input_ids(seq)
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    labels = np.full(seq.shape, -100, np.int32)
    labels[:, :-1] = seq[:, 1:]
    lps = per_token_logprobs(hidden, model.lm_head_weight(params), jnp.asarray(labels), 64)
    # generated token j's logprob lives at position p+j-1
    p = prompt.shape[1]
    replay = np.asarray(lps)[0, p - 1: p - 1 + 5]
    np.testing.assert_allclose(out["logprobs"][0], replay, rtol=1e-4, atol=1e-5)
