"""MLA compressed-KV decode: absorbed-latent generation must reproduce the
training (materialized per-head) forward exactly (greedy chain parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig, generate, init_cache
from xtuner_tpu.module.mla import MLAConfig
from xtuner_tpu.module.params import init_params


def tiny_mla_model(q_lora=True):
    cfg = DenseConfig(
        vocab_size=160, num_hidden_layers=2, hidden_size=48, intermediate_size=96,
        eos_token_id=150,
        attention=MLAConfig(num_attention_heads=4, q_lora_rank=24 if q_lora else None,
                            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
                            v_head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    return cfg, model, params


def test_cache_is_compressed():
    cfg, model, _ = tiny_mla_model()
    caches = init_cache(model, 2, 16, jnp.float32)
    ck, cv = caches[0]
    attn = cfg.attention
    assert ck.shape == (2, 2, 16, 1, attn.kv_lora_rank)
    assert cv.shape == (2, 2, 16, 1, attn.qk_rope_head_dim)


def _greedy_chain_parity(q_lora: bool):
    cfg, model, params = tiny_mla_model(q_lora)
    rng = np.random.default_rng(0)
    prompts = rng.integers(1, 150, (2, 6)).astype(np.int32)
    out = generate(model, params, prompts,
                   GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=150),
                   compute_dtype=jnp.float32)
    seqs = out["sequences"]
    # teacher-forced recompute with the TRAINING (materialized) path
    ctx = SequenceContext.from_input_ids(seqs.astype(np.int32))
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    logits = np.asarray(hidden @ np.asarray(model.lm_head_weight(params), np.float32))
    p = prompts.shape[1]
    for bi in range(2):
        for j in range(out["num_generated"]):
            prev = seqs[bi, : p + j].tolist()
            if 150 in out["generated"][bi][:j].tolist():
                break  # past EOS the row is frozen
            expect = int(np.argmax(logits[bi, p + j - 1]))
            assert expect == int(seqs[bi, p + j]), (bi, j)


def test_greedy_parity_qlora():
    _greedy_chain_parity(True)


def test_greedy_parity_full_q():
    _greedy_chain_parity(False)


def test_grouped_prefill_matches_ungrouped():
    """prompt_group_size: shared-prompt prefill + tiled KV must reproduce the
    per-row greedy generation exactly."""
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.module.attention import MHAConfig

    cfg = DenseConfig(
        vocab_size=160, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=150,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(2))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    rng = np.random.default_rng(3)
    uniq = rng.integers(1, 150, (2, 5)).astype(np.int32)
    prompts = np.repeat(uniq, 3, axis=0)  # groups of 3 identical prompts
    gen = GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=150)
    out_g = generate(model, params, prompts, gen, compute_dtype=jnp.float32,
                     prompt_group_size=3, return_logprobs=True)
    out_u = generate(model, params, prompts, gen, compute_dtype=jnp.float32,
                     return_logprobs=True)
    np.testing.assert_array_equal(out_g["generated"], out_u["generated"])
    np.testing.assert_allclose(out_g["logprobs"], out_u["logprobs"], rtol=1e-4, atol=1e-5)
