"""Float8 path: quantization roundtrip error bounds, matmul parity, training."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.ops.float8 import (Float8Config, dequantize, fp8_matmul, quantize_e4m3)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 256)) * 3.0, jnp.float32)
    for gran in ("tensorwise", "tilewise"):
        q, s = quantize_e4m3(x, gran)
        back = dequantize(q, s, gran)
        rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
        assert rel < 0.07, f"{gran}: {rel}"
    # tilewise handles per-tile outliers much better than tensorwise
    x_outlier = x.at[0, 0].set(1000.0)
    q_t, s_t = quantize_e4m3(x_outlier, "tilewise")
    q_T, s_T = quantize_e4m3(x_outlier, "tensorwise")
    err_t = np.abs(np.asarray(dequantize(q_t, s_t, "tilewise")) - np.asarray(x_outlier))[1:].max()
    err_T = np.abs(np.asarray(dequantize(q_T, s_T, "tensorwise")) - np.asarray(x_outlier))[1:].max()
    assert err_t < err_T / 1.5


def test_fp8_matmul_close_to_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    exact = np.asarray(x @ w)
    for gran in ("tensorwise", "tilewise"):
        y = np.asarray(fp8_matmul(x, w, gran))
        rel = np.abs(y - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.1, f"{gran}: {rel}"


def test_fp8_grads_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 64)) * 0.05, jnp.float32)

    def f(x, w):
        return jnp.sum(fp8_matmul(x, w, "tilewise") ** 2)

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    # bwd is bf16-exact: compare against the plain matmul gradients
    def f_ref(x, w):
        return jnp.sum((x @ w) ** 2)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    # direction must agree closely (fwd quantization perturbs magnitude a bit)
    cos = np.sum(np.asarray(gx) * np.asarray(gx_r)) / (
        np.linalg.norm(gx) * np.linalg.norm(gx_r))
    assert cos > 0.99


def test_fp8_model_trains():
    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.datasets.collator import fake_collator
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.parallel.mesh import MeshConfig

    cfg = DenseConfig(
        vocab_size=64, num_hidden_layers=2, hidden_size=128, intermediate_size=128,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=32),
        lm_loss_cfg=CELossConfig(chunk_size=64),
        float8_cfg=Float8Config(scaling_granularity="tilewise"),
    )
    eng = TrainEngine(cfg, AdamWConfig(lr=1e-3), LRConfig(warmup_steps=0, lr_type="constant"),
                      MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32"), 10)
    eng.init_random(0)
    batch = {k: v.reshape(1, 4, 32) for k, v in fake_collator(4, 32, 64, 0).items()}
    losses = [float(eng.train_step(batch, s)["reduced_llm_loss"]) for s in range(1, 5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_tilewise_kernel_matches_emulation():
    """Pallas tile-wise fp8 GEMM (interpret mode) == jnp emulation == manual
    per-tile dequant product — locks the kernel's scale indexing."""
    from xtuner_tpu.ops.fp8_gemm import (fp8_gemm_tilewise, fp8_gemm_tilewise_emulated,
                                         quantize_blockwise, quantize_tilewise)

    rng = np.random.default_rng(3)
    m, k, n = 96, 384, 384  # not block multiples (kernel pads engage)
    x = jnp.asarray(rng.standard_normal((m, k)) * (1 + 10 * (rng.random((m, k)) > 0.99)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    xq, sx = quantize_tilewise(x, 128)
    wq, sw = quantize_blockwise(w, 128)
    ker = np.asarray(fp8_gemm_tilewise(xq, sx, wq, sw, tile=128, out_dtype=jnp.float32,
                                       block_m=64, block_n=128, block_k=256,
                                       interpret=True))
    emu = np.asarray(fp8_gemm_tilewise_emulated(xq, sx, wq, sw, tile=128,
                                                out_dtype=jnp.float32))
    np.testing.assert_allclose(ker, emu, rtol=2e-5, atol=2e-5)
    # and both approximate the exact product
    exact = np.asarray(x @ w)
    rel = np.abs(emu - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.1, rel


def test_e5m2_grads_close_to_bf16_grads():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)

    def f(e5m2):
        def loss(x, w):
            return jnp.sum(fp8_matmul(x, w, "tilewise", 128, e5m2) ** 2)
        return jax.grad(loss, argnums=(0, 1))(x, w)

    gx_q, gw_q = f(True)
    gx_b, gw_b = f(False)
    for q, b in ((gx_q, gx_b), (gw_q, gw_b)):
        denom = np.abs(np.asarray(b)).max() + 1e-9
        assert np.abs(np.asarray(q) - np.asarray(b)).max() / denom < 0.15


def test_float8_config_e5m2_field():
    cfg = Float8Config(e5m2_grads=True)
    assert cfg.e5m2_grads and cfg.scaling_granularity == "tilewise"
