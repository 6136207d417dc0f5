"""QLoRA: NF4 roundtrip, HF load-quantize, forward error bound, merge export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.lora import LoraConfig, merge_lora
from xtuner_tpu.module.quant import dequantize_nf4, quantize_nf4


def test_nf4_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.02
    codes, absmax = quantize_nf4(w)
    assert codes.dtype == np.uint8 and codes.size == w.size // 2
    back = np.asarray(dequantize_nf4(jnp.asarray(codes), jnp.asarray(absmax), w.shape,
                                     dtype=jnp.float32))
    rel = np.abs(back - w).mean() / np.abs(w).mean()
    assert rel < 0.12, rel  # 4-bit: ~0.09 mean relative error on gaussian weights


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, tie_word_embeddings=False)
    torch.manual_seed(0)
    out = tmp_path_factory.mktemp("hf_q")
    Qwen3ForCausalLM(cfg).save_pretrained(out, safe_serialization=True)
    cfg.save_pretrained(out)
    return out


def qlora_cfg():
    return DenseConfig(
        vocab_size=128, num_hidden_layers=2, hidden_size=64, intermediate_size=128,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                            qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=64),
        lora_cfg=LoraConfig(r=4, alpha=8, qlora=True),
    )


@pytest.mark.slow
def test_qlora_load_and_forward(hf_dir):
    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint
    from xtuner_tpu.data_proto import SequenceContext
    from xtuner_tpu.module.params import param_shardings
    from xtuner_tpu.parallel import MeshConfig, build_mesh

    cfg = qlora_cfg()
    model = cfg.build()
    specs = model.param_specs()
    attn = specs["layers"]["attn"]["q_proj"]
    assert "w_q4" in attn and "w" not in attn

    mesh_cfg = MeshConfig()
    shardings = param_shardings(specs, build_mesh(mesh_cfg), mesh_cfg.rules())
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(), shardings)
    assert params["layers"]["attn"]["q_proj"]["w_q4"].dtype == jnp.uint8

    # full-precision reference
    cfg_fp = cfg.model_copy(update={"lora_cfg": LoraConfig(r=4, alpha=8, qlora=False)})
    model_fp = cfg_fp.build()
    specs_fp = model_fp.param_specs()
    shardings_fp = param_shardings(specs_fp, build_mesh(mesh_cfg), mesh_cfg.rules())
    params_fp = load_hf_checkpoint(hf_dir, specs_fp, model_fp.hf_key_map(), shardings_fp)

    ids = np.random.default_rng(1).integers(1, 128, (1, 16)).astype(np.int32)
    ctx = SequenceContext.from_input_ids(ids)
    h_q = np.asarray(model.forward(params, ctx, compute_dtype=jnp.float32))
    h_fp = np.asarray(model_fp.forward(params_fp, ctx, compute_dtype=jnp.float32))
    rel = np.abs(h_q - h_fp).mean() / (np.abs(h_fp).mean() + 1e-9)
    assert rel < 0.25, rel  # 4-bit base: approximate but same scale


def test_qlora_merge_produces_dense(hf_dir):
    from xtuner_tpu.module.params import init_params

    cfg = qlora_cfg()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    merged = merge_lora(params, cfg.lora_cfg.scaling)
    q = merged["layers"]["attn"]["q_proj"]
    assert "w" in q and "w_q4" not in q and "lora_a" not in q
    assert q["w"].shape == (2, 64, 64)
