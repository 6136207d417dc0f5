"""R3 rollout-routing replay: forced routing in the router, recording in
generate, and replay threading through MoE.forward."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.router import GreedyRouterConfig, route


def tiny_moe():
    cfg = MoEConfig(
        vocab_size=120, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        eos_token_id=99,
        router=GreedyRouterConfig(scoring_func="softmax", norm_topk_prob=True),
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    return cfg, model, params


def test_route_forced_idx():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)}
    cfg = GreedyRouterConfig(norm_topk_prob=True)
    x = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    fresh = route(p, cfg, x, 2)
    forced = np.full((6, 2), -1, np.int32)
    forced[0] = [3, 5]
    forced[1] = [0, 1]
    out = route(p, cfg, x, 2, forced_idx=jnp.asarray(forced))
    np.testing.assert_array_equal(np.asarray(out.topk_idx[0]), [3, 5])
    np.testing.assert_array_equal(np.asarray(out.topk_idx[1]), [0, 1])
    # unforced rows identical to fresh routing
    np.testing.assert_array_equal(np.asarray(out.topk_idx[2:]),
                                  np.asarray(fresh.topk_idx[2:]))
    # forced weights = renormalized probs at the forced experts
    probs = np.asarray(fresh.probs[0])
    expect = probs[[3, 5]] / probs[[3, 5]].sum()
    np.testing.assert_allclose(np.asarray(out.topk_weights[0]), expect, rtol=1e-6)


def test_generate_records_routing():
    cfg, model, params = tiny_moe()
    prompts = np.array([[5, 6, 7, 8], [9, 10, 11, 12]], np.int32)
    out = generate(model, params, prompts,
                   GenerateConfig(max_new_tokens=4, do_sample=False, eos_token_id=99),
                   compute_dtype=jnp.float32, record_routing=True)
    r = out["routed_experts"]
    assert r.shape == (2, 4, cfg.num_hidden_layers, cfg.num_experts_per_tok)
    assert r.min() >= 0 and r.max() < cfg.n_routed_experts


def test_moe_forward_replays_recorded_routing():
    """Force every response token to expert 0 -> expert_load concentrates on
    expert 0 exactly at the replayed positions."""
    cfg, model, params = tiny_moe()
    b, l, k = 1, 8, cfg.num_experts_per_tok
    nl = cfg.num_hidden_layers
    ids = np.arange(1, l + 1, dtype=np.int32)[None]
    ctx = SequenceContext.from_input_ids(ids)

    model.forward(params, ctx, compute_dtype=jnp.float32)
    _, _, load_fresh = model._last_aux

    routed = np.full((b, l, nl, k), -1, np.int32)
    routed[:, 4:] = 0  # replay positions 4.. -> expert 0 (both slots)
    ctx_r = ctx.replace(rollout_routed_experts=jnp.asarray(routed))
    model.forward(params, ctx_r, compute_dtype=jnp.float32)
    _, _, load_replay = model._last_aux

    load_fresh = np.asarray(load_fresh)
    load_replay = np.asarray(load_replay)
    # 4 replayed tokens x k=2 slots forced onto expert 0 per layer
    assert (load_replay[:, 0] >= 8).all(), load_replay
    # totals conserved (dropless)
    assert load_replay.sum() == load_fresh.sum() == l * k * nl
