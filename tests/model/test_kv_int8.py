"""int8 quantized paged KV cache (kv_cache_dtype="int8").

Reference parity target: LMDeploy/vLLM KV-int8 serving (the engines the
reference's rollouts delegate to, xtuner/v1/rl/rollout/worker.py:510).
Checks: pack/unpack error bound, greedy rollout parity vs the bf16 cache
(tiny models: quantization error ~1/127 absmax must not flip argmax), MLA
and sinks/window variants, and halved pool bytes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.model.paged_generate import PagedGenerator
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.kv_cache import (KV_SCALE_BYTES, pack_kv_int8,
                                        quant_dim, unpack_kv_int8)
from xtuner_tpu.module.params import init_params


def test_pack_unpack_roundtrip_bound():
    rng = jax.random.key(0)
    v = jax.random.normal(rng, (3, 5, 4, 32), jnp.float32) * 7.0
    packed = pack_kv_int8(v)
    assert packed.shape == (3, 5, 4, 32 + KV_SCALE_BYTES)
    assert packed.dtype == jnp.int8
    q, s = unpack_kv_int8(packed)
    deq = q.astype(jnp.float32) * s[..., None]
    absmax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    # absmax quantization: error <= scale/2 = absmax/254 per element
    err = jnp.max(jnp.abs(deq - v) / jnp.maximum(absmax, 1e-6))
    assert float(err) <= (0.5 / 127.0) + 1e-6


def _engine(gcfg_extra=None, **model_kw):
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8, **model_kw),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=198, max_length=256, paged_max_batch=4,
                       paged_block_size=16, **(gcfg_extra or {}))
    return model, params, g


def _outs(model, params, g, kv_dtype):
    g2 = g.model_copy(update={"kv_cache_dtype": kv_dtype})
    pg = PagedGenerator(model, params, g2, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    reqs = [{"prompt_ids": [5, 6, 7, 8, 9]}, {"prompt_ids": [11, 12, 13]}]
    return pg, pg.generate(reqs)


@pytest.mark.parametrize("kw", [{}, {"with_sinks": True},
                                {"with_gate": True}])
def test_int8_matches_bf16_greedy(kw):
    """Greedy rollouts agree until quantization hits a near-tied argmax
    (random tiny models tie often); after the first divergence the chains
    legitimately differ, so compare the common prefix."""
    model, params, g = _engine(**kw)
    _, ref = _outs(model, params, g, "bf16")
    pg, out = _outs(model, params, g, "int8")
    assert pg.cache.pool_k.dtype == jnp.int8
    assert pg.cache.pool_k.shape[-1] == quant_dim(8)
    for r, o in zip(ref, out):
        agree = 0
        for a, b in zip(r["token_ids"], o["token_ids"]):
            if a != b:
                break
            agree += 1
        assert agree >= 3, (r["token_ids"], o["token_ids"])
        np.testing.assert_allclose(o["logprobs"][:agree],
                                   r["logprobs"][:agree], atol=0.05)


@pytest.mark.parametrize("kw", [{"with_sinks": True}, {"with_gate": True}])
def test_int8_layer_output_parity(kw):
    """Direct decode-layer output check: int8 pool vs exact f32 pool holding
    the same KV must agree to absmax-quantization tolerance."""
    from xtuner_tpu.model.paged_generate import _paged_layer_decode
    from xtuner_tpu.module.kv_cache import PagedKVCache
    from xtuner_tpu.module.rope import rope_cos_sin

    model, params, _ = _engine(**kw)
    cfg = model.cfg
    lp = jax.tree.map(lambda a: a, params["layers"])
    lp = jax.tree.map(lambda a: a[0], lp)  # layer 0 params
    b, bs, mb = 2, 16, 3
    table = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    seq_lens = jnp.asarray([20, 7], jnp.int32)
    x = jax.random.normal(jax.random.key(3), (b, 1, cfg.hidden_size),
                          jnp.float32) * 0.3
    cos, sin = rope_cos_sin(seq_lens[:, None], cfg.attention.head_dim,
                            cfg.rope_theta, None,
                            cfg.max_position_embeddings)
    kv = jax.random.normal(jax.random.key(4),
                           (2, 6, bs, 2, 8), jnp.float32)  # past KV content
    outs = {}
    for dt in (jnp.float32, jnp.int8):
        cache = PagedKVCache(1, 8, bs, 2, 8, dtype=dt)
        pk = cache.pool_k.at[0, 1:7].set(
            kv[0] if dt != jnp.int8 else cache.pool_k[0, 1:7])
        pv = cache.pool_v.at[0, 1:7].set(
            kv[1] if dt != jnp.int8 else cache.pool_v[0, 1:7])
        if dt == jnp.int8:
            from xtuner_tpu.module.kv_cache import pack_kv_int8

            pk = cache.pool_k.at[0, 1:7].set(pack_kv_int8(kv[0]))
            pv = cache.pool_v.at[0, 1:7].set(pack_kv_int8(kv[1]))
        o, _, _, _ = _paged_layer_decode(lp, cfg, x, cos, sin, pk, pv, 0,
                                         table, seq_lens, jnp.float32)
        outs[dt] = np.asarray(o)
    np.testing.assert_allclose(outs[jnp.int8], outs[jnp.float32],
                               atol=5e-2, rtol=5e-2)


def test_int8_sliding_window():
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198, use_sliding_window=True,
        sliding_window=24,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=198, max_length=256, paged_max_batch=2,
                       paged_block_size=16)
    outs = {}
    for dt in ("bf16", "int8"):
        pg = PagedGenerator(model, params,
                            g.model_copy(update={"kv_cache_dtype": dt}),
                            max_batch=2, block_size=16,
                            compute_dtype=jnp.float32, pad_token_id=0)
        outs[dt] = pg.generate([{"prompt_ids": list(range(3, 40))}])
    assert outs["int8"][0]["token_ids"] == outs["bf16"][0]["token_ids"]


def test_int8_mla_paged():
    from xtuner_tpu.module.mla import MLAConfig

    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=198,
        attention=MLAConfig(num_attention_heads=4, q_lora_rank=None,
                            kv_lora_rank=16, qk_nope_head_dim=8,
                            qk_rope_head_dim=4, v_head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    g = GenerateConfig(max_new_tokens=8, do_sample=False, temperature=0.0,
                       eos_token_id=198, max_length=256, paged_max_batch=2,
                       paged_block_size=16)
    outs = {}
    for dt in ("bf16", "int8"):
        pg = PagedGenerator(model, params,
                            g.model_copy(update={"kv_cache_dtype": dt}),
                            max_batch=2, block_size=16,
                            compute_dtype=jnp.float32, pad_token_id=0)
        outs[dt] = pg.generate([{"prompt_ids": [5, 6, 7, 8, 9]},
                                {"prompt_ids": [11, 12, 13]}])
    for r, o in zip(outs["bf16"], outs["int8"]):
        assert o["token_ids"] == r["token_ids"]


def test_int8_prefix_sharing_group():
    model, params, g = _engine()
    g2 = g.model_copy(update={"kv_cache_dtype": "int8"})
    pg = PagedGenerator(model, params, g2, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    prompt = list(range(3, 38))  # crosses block boundaries
    outs = pg.generate([{"prompt_ids": prompt, "group": "g1"}
                        for _ in range(3)])
    assert len(outs) == 3
    assert outs[0]["token_ids"] == outs[1]["token_ids"] == outs[2]["token_ids"]
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks

    # capacity: int8 pool rows are head_dim+4 bytes vs head_dim*itemsize
    b16 = PagedGenerator(model, params,
                         g.model_copy(update={"kv_cache_dtype": "bf16"}),
                         max_batch=4, block_size=16,
                         compute_dtype=jnp.bfloat16, pad_token_id=0)
    assert (pg.cache.pool_k.nbytes / b16.cache.pool_k.nbytes
            == pytest.approx((8 + KV_SCALE_BYTES) / (2 * 8)))
