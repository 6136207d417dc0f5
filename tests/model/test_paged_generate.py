"""Paged continuous-batching rollout engine vs the dense engine.

Greedy decode must produce identical tokens through either engine; the
continuous-batching driver must handle more requests than decode slots; GRPO
groups must share prompt blocks (allocator refcounts prove it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.model.paged_generate import PagedGenerator, paged_eligible
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.router import GreedyRouterConfig


def _dense_model(qk_norm=False, qkv_bias=False):
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                            qk_norm=qk_norm, qkv_bias=qkv_bias),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    return cfg, model, params


def _greedy(n=12, max_len=512):
    return GenerateConfig(max_new_tokens=n, do_sample=False, temperature=0.0,
                          eos_token_id=198, max_length=max_len,
                          paged_max_batch=4, paged_block_size=16)


@pytest.mark.parametrize("qk_norm,qkv_bias", [(False, False), (True, True)])
def test_paged_matches_dense_greedy(qk_norm, qkv_bias):
    cfg, model, params = _dense_model(qk_norm, qkv_bias)
    assert paged_eligible(cfg)
    g = _greedy()
    prompts = [[5, 6, 7, 8, 9], [11, 12, 13]]
    # dense engine (left-padded batch)
    arr = np.zeros((2, 5), np.int32)
    arr[0] = prompts[0]
    arr[1, 2:] = prompts[1]
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0)
    pg = PagedGenerator(model, params, g, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in prompts])
    for i in range(2):
        d = list(dense["generated"][i])
        p = outs[i]["token_ids"]
        if 198 in d:
            d = d[: d.index(198) + 1]
        assert p[: len(d)] == d, (i, p, d)


def test_continuous_batching_more_requests_than_slots():
    cfg, model, params = _dense_model()
    g = _greedy(n=6)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    reqs = [{"prompt_ids": [3 + i, 4 + i, 5 + i]} for i in range(5)]
    outs = pg.generate(reqs)
    assert len(outs) == 5
    for o in outs:
        assert 1 <= len(o["token_ids"]) <= 6
        assert len(o["logprobs"]) == len(o["token_ids"])
        assert o["finish_reason"] in ("stop", "length")
    # no leaks afterwards (trash block + prefix-cache retained blocks only)
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks
    # results keyed to request order: same prompt -> same greedy tokens
    outs2 = pg.generate([reqs[0]])
    assert outs2[0]["token_ids"] == outs[0]["token_ids"]


def test_group_prefix_sharing_allocates_once():
    cfg, model, params = _dense_model()
    g = _greedy(n=4)
    pg = PagedGenerator(model, params, g, max_batch=4, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    prompt = list(range(3, 3 + 33))  # 33 tokens: 2 aligned blocks + tail
    reqs = [{"prompt_ids": prompt, "group": "g0"} for _ in range(4)]
    before = pg.cache.allocator.free_blocks
    outs = pg.generate(reqs)
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks
    # same prompt + greedy -> identical continuations across the group
    toks = {tuple(o["token_ids"]) for o in outs}
    assert len(toks) == 1
    # every non-free block is retained by the prefix cache, not leaked
    assert before == pg.cache.allocator.free_blocks + len(pg.prefix_cache)


def test_paged_moe_with_routing_record():
    cfg = MoEConfig(
        vocab_size=127, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, n_routed_experts=4, num_experts_per_tok=2,
        eos_token_id=126, router=GreedyRouterConfig(),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    g = GenerateConfig(max_new_tokens=5, do_sample=False, temperature=0.0,
                       eos_token_id=126, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0,
                        record_routing=True)
    outs = pg.generate([{"prompt_ids": [7, 8, 9, 10]}])
    o = outs[0]
    r = o["routed_experts"]
    assert r.shape == (len(o["token_ids"]), cfg.num_hidden_layers,
                       cfg.num_experts_per_tok)
    assert (r >= 0).all() and (r < 4).all()
    # parity with the dense engine's routing record
    arr = np.asarray([[7, 8, 9, 10]], np.int32)
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0, record_routing=True, return_logprobs=True)
    n = len(o["token_ids"])
    np.testing.assert_array_equal(dense["generated"][0][:n], o["token_ids"])
    np.testing.assert_array_equal(dense["routed_experts"][0][:n], r)


def test_worker_uses_paged_engine():
    from xtuner_tpu.rl.worker import RolloutWorker
    from xtuner_tpu.rl.transport import ParamStore

    cfg, model, params = _dense_model()
    store = ParamStore(params)
    w = RolloutWorker(cfg, gen_cfg=_greedy(n=6), compute_dtype=jnp.float32,
                      pad_token_id=0, param_store=store)
    resp = w.complete({"prompt_ids": [[5, 6, 7], [9, 10, 11]], "n": 2,
                       "logprobs": True})
    assert len(resp["choices"]) == 4
    assert w._paged_engines  # the paged engine actually served it
    for c in resp["choices"]:
        assert c["token_ids"] and "token_logprobs" in c["logprobs"]


def test_paged_sinks_gate_matches_dense_greedy():
    """GPT-OSS sinks + Qwen3-Next output gating through the paged decode ==
    the dense engine (attention.py:201-213 semantics)."""
    cfg = DenseConfig(
        vocab_size=199, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=198,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                            with_sinks=True, with_gate=True, qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    assert paged_eligible(cfg)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(2))
    # non-zero sinks so the sink branch actually changes the softmax
    params["layers"]["attn"]["sinks"] = 0.5 + jnp.arange(
        2 * 4, dtype=jnp.float32).reshape(2, 4) / 4.0
    g = _greedy(n=8)
    prompts = [[5, 6, 7, 8, 9], [11, 12, 13]]
    arr = np.zeros((2, 5), np.int32)
    arr[0] = prompts[0]
    arr[1, 2:] = prompts[1]
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in prompts])
    for i in range(2):
        d = list(dense["generated"][i])
        if 198 in d:
            d = d[: d.index(198) + 1]
        p = outs[i]["token_ids"]
        assert p[: len(d)] == d, (i, p, d)


def test_gpt_oss_window_pattern_decode_matches_training_forward():
    """Alternating sliding/full layers (layer_window_pattern) must be honored
    at decode: greedy tokens == argmax of the TRAINING forward replayed over
    the full sequence, with the context well past the 8-token window. Also
    checks paged == dense."""
    from xtuner_tpu.data_proto.sequence_context import SequenceContext
    from xtuner_tpu.model.gpt_oss import gpt_oss_tiny

    cfg = gpt_oss_tiny(num_hidden_layers=2, eos_token_id=126, vocab_size=127)
    assert paged_eligible(cfg)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(3))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    params["moe_layers"]["attn"]["sinks"] = 0.5 + jnp.arange(
        2 * 4, dtype=jnp.float32).reshape(2, 4) / 4.0
    prompt = [(3 + i) % 120 for i in range(14)]  # prompt alone > window=8
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=126, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    dense = generate(model, params, np.asarray([prompt], np.int32), g,
                     compute_dtype=jnp.float32, pad_token_id=0)
    seq = dense["sequences"][0]
    ctx = SequenceContext.from_input_ids(seq[None, :])
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32, remat="none")
    logits = np.asarray(hidden @ model.lm_head_weight(params))
    stop = list(seq).index(126) + 1 if 126 in list(seq[14:]) else len(seq)
    for t in range(14, stop):
        pred = int(np.argmax(logits[0, t - 1]))
        assert pred == int(seq[t]), f"window-pattern decode drift at {t}"

    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": prompt}])
    d = list(dense["generated"][0])
    if 126 in d:
        d = d[: d.index(126) + 1]
    assert outs[0]["token_ids"][: len(d)] == d


def test_paged_mla_matches_dense_greedy():
    """Compressed-KV MLA paged decode == the dense MLA engine (greedy)."""
    from xtuner_tpu.module.mla import MLAConfig

    cfg = DenseConfig(
        vocab_size=160, num_hidden_layers=2, hidden_size=48, intermediate_size=96,
        eos_token_id=150,
        attention=MLAConfig(num_attention_heads=4, q_lora_rank=24,
                            kv_lora_rank=16, qk_nope_head_dim=8,
                            qk_rope_head_dim=4, v_head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    assert paged_eligible(cfg)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    g = GenerateConfig(max_new_tokens=6, do_sample=False, temperature=0.0,
                       eos_token_id=150, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    prompts = [[5, 6, 7, 8, 9, 10], [11, 12, 13]]
    arr = np.zeros((2, 6), np.int32)
    arr[0] = prompts[0]
    arr[1, 3:] = prompts[1]
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in prompts])
    for i in range(2):
        d = list(dense["generated"][i])
        if 150 in d:
            d = d[: d.index(150) + 1]
        p = outs[i]["token_ids"]
        assert p[: len(d)] == d, (i, p, d)


# ------------------------------------------------------------- hybrid GDN
def _hybrid_paged_cfg(moe=False):
    """Qwen3.5-shaped tiny hybrid: GDN + gated full attention pattern."""
    from xtuner_tpu.model.hybrid import HybridConfig, HybridMoEConfig
    from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig

    kw = dict(
        vocab_size=160, num_hidden_layers=4, hidden_size=32,
        eos_token_id=150, layer_types_pattern=["linear", "full"],
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8,
                                             conv_kernel_size=4),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8, with_gate=True, qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    if moe:
        return HybridMoEConfig(moe_intermediate_size=16, n_routed_experts=4,
                               num_experts_per_tok=2, n_shared_experts=1,
                               with_shared_expert_gate=True,
                               router=GreedyRouterConfig(), intermediate_size=0,
                               **kw)
    return HybridConfig(intermediate_size=64, **kw)


@pytest.mark.parametrize("moe", [False, True])
def test_paged_hybrid_matches_dense_greedy(moe):
    """Qwen3.5-style GDN hybrid through the paged engine == the dense
    engine: full-attn sub-layers page KV, GDN sub-layers carry per-slot
    recurrent state written by the (right-padded) prefill."""
    cfg = _hybrid_paged_cfg(moe)
    assert paged_eligible(cfg)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(4 + moe))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    g = GenerateConfig(max_new_tokens=7, do_sample=False, temperature=0.0,
                       eos_token_id=150, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    prompts = [[5, 6, 7, 8, 9, 10], [11, 12, 13]]
    arr = np.zeros((2, 6), np.int32)
    arr[0] = prompts[0]
    arr[1, 3:] = prompts[1]
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in prompts])
    for i in range(2):
        d = list(dense["generated"][i])
        if 150 in d:
            d = d[: d.index(150) + 1]
        p = outs[i]["token_ids"]
        assert p[: len(d)] == d, (i, p, d)


def test_paged_hybrid_continuous_batching_and_groups():
    """More requests than slots (slot reuse overwrites stale GDN state) and
    group prompt sharing (sibling gets the leader's post-prompt recurrent
    snapshot, not its post-decode state)."""
    cfg = _hybrid_paged_cfg(moe=False)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(6))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    g = GenerateConfig(max_new_tokens=5, do_sample=False, temperature=0.0,
                       eos_token_id=150, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    prompt = list(range(3, 3 + 20))  # > one block: aligned prefix + tail
    reqs = ([{"prompt_ids": prompt, "group": "g0"} for _ in range(3)]
            + [{"prompt_ids": [40 + i, 41 + i]} for i in range(2)])
    outs = pg.generate(reqs)
    assert len(outs) == 5
    # greedy + shared prompt -> identical tokens across the whole group,
    # and they match a fresh ungrouped run of the same prompt
    toks = {tuple(o["token_ids"]) for o in outs[:3]}
    assert len(toks) == 1
    solo = pg.generate([{"prompt_ids": prompt}])
    assert solo[0]["token_ids"] == outs[0]["token_ids"]
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks


# ------------------------------------------------------------- MTP speculative
def _mtp_moe_model(seed=2, mla=False):
    from xtuner_tpu.module.mla import MLAConfig

    attn = (MLAConfig(num_attention_heads=4, kv_lora_rank=16, q_lora_rank=None,
                      qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8)
            if mla else
            MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8))
    cfg = MoEConfig(
        vocab_size=127, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, n_routed_experts=4, num_experts_per_tok=2,
        mtp_num_layers=1, mtp_loss_coef=0.3,
        eos_token_id=126, router=GreedyRouterConfig(),
        attention=attn,
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(seed))
    return cfg, model, params


def test_speculative_accept_is_distribution_exact():
    """Leviathan accept/reject: the committed token's marginal distribution
    equals the target's filtered softmax regardless of the draft quality."""
    from xtuner_tpu.model.paged_generate import speculative_accept

    g = GenerateConfig(max_new_tokens=1, do_sample=True, temperature=0.7,
                       top_k=0, top_p=1.0, max_length=64)
    k0 = jax.random.key(0)
    l0 = jax.random.normal(jax.random.key(1), (1, 5)) * 2.0     # target
    dl = jax.random.normal(jax.random.key(2), (1, 5)) * 2.0     # draft (bad)
    q = jax.nn.softmax(np.asarray(dl[0]) / g.temperature)
    p = jax.nn.softmax(np.asarray(l0[0]) / g.temperature)
    n = 20000
    keys = jax.random.split(k0, n)

    def one(key):
        kd, ka = jax.random.split(key)
        draft = jax.random.categorical(kd, dl / g.temperature, axis=-1).astype(jnp.int32)
        tok, acc = speculative_accept(l0, dl, draft, ka, g)
        return tok[0], acc[0]

    toks, accs = jax.vmap(one)(keys)
    toks = np.asarray(toks)
    emp = np.bincount(toks, minlength=5) / n
    np.testing.assert_allclose(emp, np.asarray(p), atol=0.015)
    # acceptance rate matches sum_d q(d) min(1, p/q) = sum min(p, q)
    np.testing.assert_allclose(np.mean(np.asarray(accs)),
                               np.minimum(p, q).sum(), atol=0.015)


@pytest.mark.parametrize("mla", [False, True])
def test_mtp_speculative_matches_plain_paged_greedy(mla):
    """Greedy spec decode must emit EXACTLY the plain engine's tokens —
    acceptance only changes how many verify steps it takes. Random-init MTP
    means plenty of rejects, exercising the KV-overwrite/rollback path.
    mla=True is the DeepSeek-V3 shape (MTP's home turf): the MTP layer's
    compressed-latent KV rides the same paged pool."""
    cfg, model, params = _mtp_moe_model(mla=mla)
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=126, max_length=256,
                       paged_max_batch=2, paged_block_size=16)
    prompts = [[7, 8, 9, 10], [20, 21, 22], [33, 34, 35, 36, 37]]
    plain = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                           compute_dtype=jnp.float32, pad_token_id=0)
    base = plain.generate([{"prompt_ids": p} for p in prompts])

    gs = g.model_copy(update={"mtp_speculative": True})
    spec = PagedGenerator(model, params, gs, max_batch=2, block_size=16,
                          compute_dtype=jnp.float32, pad_token_id=0)
    # 3 requests > 2 slots: continuous batching through the spec path too
    outs = spec.generate([{"prompt_ids": p} for p in prompts])
    for b, o in zip(base, outs):
        assert o["token_ids"] == b["token_ids"], (o, b)
        assert len(o["logprobs"]) == len(o["token_ids"])
        assert o["spec_steps"] >= 1
        assert 0 <= o["spec_accepted"] <= o["spec_steps"]
        # tokens == steps + accepted_bonuses (up to eos/budget discards)
        assert len(o["token_ids"]) <= 1 + o["spec_steps"] + o["spec_accepted"]
    spec.check_block_conservation()
    assert not spec.cache.tables  # no live sequences leak blocks


def test_mtp_speculative_sampling_runs():
    cfg, model, params = _mtp_moe_model()
    g = GenerateConfig(max_new_tokens=8, do_sample=True, temperature=0.8,
                       top_p=0.95, eos_token_id=126, max_length=256)
    gs = g.model_copy(update={"mtp_speculative": True})
    spec = PagedGenerator(model, params, gs, max_batch=2, block_size=16,
                          compute_dtype=jnp.float32, pad_token_id=0,
                          rng=jax.random.key(7))
    outs = spec.generate([{"prompt_ids": [5, 6, 7]}, {"prompt_ids": [9, 10]}])
    for o in outs:
        assert 1 <= len(o["token_ids"]) <= 8
        assert len(o["logprobs"]) == len(o["token_ids"])
        assert o["finish_reason"] in ("stop", "length")
