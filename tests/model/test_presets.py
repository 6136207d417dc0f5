"""DeepSeek V3 (MLA + noaux + shared experts) and GPT-OSS (sinks + alternating
window + clipped swiglu) presets: forward/loss/grads on tiny variants."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.model.deepseek import deepseek_v3_tiny
from xtuner_tpu.model.gpt_oss import gpt_oss_tiny
from xtuner_tpu.module.params import init_params
from xtuner_tpu.ops.attention.reference import reference_attention


def make_batch(rng, b=1, l=32, vocab=128):
    ids = rng.integers(2, vocab, (b, l)).astype(np.int32)
    seg = np.ones((b, l), np.int32)
    pos = np.tile(np.arange(l, dtype=np.int32), (b, 1))
    ctx = SequenceContext(input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
                          position_ids=jnp.asarray(pos))
    labels = np.roll(ids, -1, 1); labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)
    return ctx, jnp.asarray(labels), jnp.asarray(weights)


def _loss_and_grads(cfg):
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    ctx, labels, weights = make_batch(np.random.default_rng(0), vocab=cfg.vocab_size)

    def f(p):
        return model.loss(p, ctx, labels, weights, jnp.sum(weights),
                          compute_dtype=jnp.float32).total_loss()

    loss, grads = jax.value_and_grad(f)(params)
    return model, params, float(loss), grads


@pytest.mark.slow
def test_deepseek_v3_tiny():
    cfg = deepseek_v3_tiny(balancing_loss_coef=0.01)
    model, params, loss, grads = _loss_and_grads(cfg)
    assert np.isfinite(loss)
    # MLA params exist and receive grads
    g = grads["moe_layers"]["attn"]["kv_b_proj"]["w"]
    assert float(jnp.abs(g).sum()) > 0
    g_q = grads["moe_layers"]["attn"]["q_a_proj"]["w"]
    assert float(jnp.abs(g_q).sum()) > 0
    # shared experts present
    assert "shared_experts" in params["moe_layers"]
    # noaux correction bias is NOT gradient-trained
    g_bias = grads["moe_layers"]["router"]["e_score_correction_bias"]
    np.testing.assert_allclose(np.asarray(g_bias), 0.0)
    # dense first-k layer exists
    assert "dense_layers" in params


@pytest.mark.slow
def test_gpt_oss_tiny():
    cfg = gpt_oss_tiny()
    model, params, loss, grads = _loss_and_grads(cfg)
    assert np.isfinite(loss)
    # sinks receive gradients
    g_sinks = grads["moe_layers"]["attn"]["sinks"]
    assert g_sinks.shape[-1] == 4
    assert np.abs(np.asarray(g_sinks)).sum() > 0
    # window-pattern stacking: 4 layers, period 2 -> aux per layer still 4
    assert params["moe_layers"]["experts"]["gate_proj"].shape[0] == 4


def test_gpt_oss_window_pattern_matches_manual():
    """Pattern [w, None] must equal running layers with those windows manually."""
    cfg = gpt_oss_tiny(num_hidden_layers=2)
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    ctx, labels, weights = make_batch(np.random.default_rng(1), vocab=cfg.vocab_size)
    out = model.forward(params, ctx, compute_dtype=jnp.float32)

    # manual: layer 0 with window=8, layer 1 full
    cfg_uniform = gpt_oss_tiny(num_hidden_layers=2, layer_window_pattern=None,
                               use_sliding_window=True, sliding_window=8)
    m2 = cfg_uniform.build()
    # run manually via _moe_layer_forward
    from xtuner_tpu.module.rope import rope_cos_sin
    cos, sin = rope_cos_sin(ctx.position_ids, cfg.attention.head_dim, cfg.rope_theta)
    x = jnp.take(params["embed"]["w"], ctx.input_ids, axis=0).astype(jnp.float32)
    valid = (ctx.segment_ids != 0).reshape(-1)
    from xtuner_tpu.parallel.sharding import NULL_SHARD_CTX
    for k, win in enumerate([8, None]):
        lp = jax.tree.map(lambda a: a[k], params["moe_layers"])
        x, _ = model._moe_layer_forward(x, lp, cfg, cos, sin, ctx.segment_ids, valid,
                                        NULL_SHARD_CTX, jnp.float32, window=win)
    from xtuner_tpu.ops.rms_norm import rms_norm
    x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=2e-5, atol=2e-5)
