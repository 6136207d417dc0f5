"""Hybrid (GatedDeltaNet + full attention) cached generation.

Round 3 found `generate` silently ran ZERO layers for pattern-stacked models
(_stacks knew no 'pattern' key) — rollouts were plausible garbage. Hybrids
now decode through forward_cached hooks: GDN layers carry an O(1) recurrent
cache (fast-weight state + conv buffer), full layers a KV cache. Greedy
decode must reproduce the teacher-forced training forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.hybrid import HybridConfig, HybridMoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.router import GreedyRouterConfig


def _hybrid_cfg(moe=False, gate=False):
    kw = dict(
        vocab_size=160, num_hidden_layers=4, hidden_size=32,
        eos_token_id=150, layer_types_pattern=["linear", "full"],
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8,
                                             conv_kernel_size=4),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8, with_gate=gate),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    if moe:
        return HybridMoEConfig(moe_intermediate_size=16, n_routed_experts=4,
                               num_experts_per_tok=2, n_shared_experts=1,
                               with_shared_expert_gate=True,
                               router=GreedyRouterConfig(), intermediate_size=0,
                               **kw)
    return HybridConfig(intermediate_size=64, **kw)


def _greedy_chain_parity(cfg, seed=0):
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(seed))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    rng = np.random.default_rng(seed)
    # left-padded batch exercises the GDN pad-protection path
    prompts = np.zeros((2, 6), np.int32)
    prompts[0] = rng.integers(1, 150, 6)
    prompts[1, 2:] = rng.integers(1, 150, 4)
    out = generate(model, params, prompts,
                   GenerateConfig(max_new_tokens=5, do_sample=False,
                                  eos_token_id=150),
                   compute_dtype=jnp.float32)
    seqs = out["sequences"]
    for row in range(2):
        ids = seqs[row][seqs[row] != 0][None]  # strip left pads
        ctx = SequenceContext.from_input_ids(ids.astype(np.int32))
        hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
        logits = np.asarray(hidden @ model.lm_head_weight(params))
        greedy = np.argmax(logits[0], -1)
        n_prompt = int((prompts[row] != 0).sum())
        expect = greedy[n_prompt - 1:-1]
        got = out["generated"][row]
        # compare until first eos
        for a, b in zip(got, expect):
            assert a == b, (row, list(got), list(expect))
            if a == 150:
                break


def test_hybrid_dense_greedy_parity():
    _greedy_chain_parity(_hybrid_cfg())


def test_hybrid_moe_gated_greedy_parity():
    _greedy_chain_parity(_hybrid_cfg(moe=True, gate=True), seed=1)


def test_unknown_stack_fails_loudly():
    from xtuner_tpu.model.generate import _stacks

    class FakeModel:
        pass

    with pytest.raises(ValueError, match="no recognized layer stacks"):
        _stacks(FakeModel(), {"pattern": {}, "embed": {}})


def test_gdn_cached_matches_full_forward():
    """Chunked prefill + per-token decode through gdn_cached_forward equals
    one full gdn_forward over the same tokens."""
    from xtuner_tpu.module.gated_deltanet import (GatedDeltaNetConfig,
                                                  gdn_cached_forward,
                                                  gdn_forward, gdn_param_specs)
    from xtuner_tpu.module.params import init_params as init_p

    cfg = GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2, head_k_dim=8,
                              head_v_dim=8, conv_kernel_size=4)
    specs = gdn_param_specs(cfg, 32)
    p = jax.tree.map(lambda x: x.astype(jnp.float32),
                     init_p(specs, jax.random.key(2)))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 10, 32)), jnp.float32)
    seg = jnp.ones((1, 10), jnp.int32)
    full = gdn_forward(p, cfg, x, seg)

    s = jnp.zeros((1, cfg.num_v_heads, cfg.head_k_dim, cfg.head_v_dim), jnp.float32)
    buf = jnp.zeros((1, cfg.conv_kernel_size - 1, cfg.conv_channels), jnp.float32)
    out_pre, s, buf = gdn_cached_forward(p, cfg, x[:, :6], s, buf)
    outs = [out_pre]
    for t in range(6, 10):
        o, s, buf = gdn_cached_forward(p, cfg, x[:, t:t + 1], s, buf)
        outs.append(o)
    chained = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(full),
                               rtol=2e-4, atol=2e-5)
