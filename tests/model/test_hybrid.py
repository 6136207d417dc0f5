"""Hybrid linear/full attention (Qwen3.5-style): forward, grads, HF roundtrip."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.hybrid import HybridConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig
from xtuner_tpu.module.params import init_params, param_shardings


def tiny_hybrid():
    return HybridConfig(
        vocab_size=128, num_hidden_layers=4, hidden_size=32, intermediate_size=64,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8, chunk_size=16),
        layer_types_pattern=["linear", "full"],
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


def make_batch(rng, b=2, l=32, vocab=128):
    ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
    seg = np.ones((b, l), np.int32)
    seg[:, l // 2:] = 2
    pos = np.concatenate([np.arange(l // 2), np.arange(l - l // 2)])[None].repeat(b, 0).astype(np.int32)
    return SequenceContext(input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
                           position_ids=jnp.asarray(pos)), ids


@pytest.mark.slow
def test_hybrid_forward_loss_grads():
    cfg = tiny_hybrid()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    assert "p0" in params["pattern"] and "p1" in params["pattern"]
    # 4 layers / period 2 -> each stack depth 2
    assert params["pattern"]["p0"]["attn"]["a_log"].shape == (2, 4)
    ctx, ids = make_batch(np.random.default_rng(0))
    labels = np.roll(ids, -1, 1); labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)

    def f(p):
        return model.loss(p, ctx, jnp.asarray(labels), jnp.asarray(weights),
                          jnp.sum(weights), compute_dtype=jnp.float32).loss

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    g_lin = grads["pattern"]["p0"]["attn"]["in_proj_qkvz"]["w"]
    g_full = grads["pattern"]["p1"]["attn"]["q_proj"]["w"]
    assert float(jnp.abs(g_lin).sum()) > 0
    assert float(jnp.abs(g_full).sum()) > 0


def test_hybrid_hf_roundtrip(tmp_path):
    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint, save_hf_checkpoint
    from xtuner_tpu.parallel import MeshConfig, build_mesh

    cfg = tiny_hybrid()
    model = cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig()
    shardings = param_shardings(specs, build_mesh(mesh_cfg), mesh_cfg.rules())
    params = jax.device_put(init_params(specs, jax.random.key(1)), shardings)
    out = tmp_path / "hf"
    save_hf_checkpoint(out, params, model.hf_key_map(), None)

    from safetensors import safe_open
    with safe_open(out / "model.safetensors", framework="np") as f:
        keys = set(f.keys())
    # interleaved HF numbering: layers 0,2 linear; 1,3 full
    assert "model.layers.0.linear_attn.in_proj_qkvz.weight" in keys
    assert "model.layers.2.linear_attn.A_log" in keys
    assert "model.layers.1.self_attn.q_proj.weight" in keys
    assert "model.layers.3.self_attn.q_proj.weight" in keys

    params2 = load_hf_checkpoint(out, specs, model.hf_key_map(), shardings)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
