"""LoRA: adapter specs, frozen-base training, merged export, HF load."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.lora import LoraConfig, merge_lora
from xtuner_tpu.parallel.mesh import MeshConfig


def lora_cfg_model(**kw):
    return DenseConfig(
        vocab_size=64,
        num_hidden_layers=2,
        hidden_size=32,
        intermediate_size=64,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
        lora_cfg=LoraConfig(r=4, alpha=8),
        **kw,
    )


def make_engine(cfg):
    eng = TrainEngine(cfg, AdamWConfig(lr=1e-2), LRConfig(warmup_steps=0, lr_type="constant"),
                      MeshConfig(fsdp_size=4, sp_size=2, param_dtype="float32"), 10)
    eng.init_random(0)
    return eng


def test_lora_specs_present():
    model = lora_cfg_model().build()
    specs = model.param_specs()
    attn = specs["layers"]["attn"]
    assert "lora_a" in attn["q_proj"] and "lora_b" in attn["q_proj"]
    # stacked over layers with rank dim
    assert attn["q_proj"]["lora_a"].shape == (2, 32, 4)
    assert attn["q_proj"]["lora_b"].shape == (2, 4, 32)


@pytest.mark.slow
def test_only_lora_params_update():
    eng = make_engine(lora_cfg_model())
    before = jax.device_get(eng.params)
    batch = {k: v.reshape(1, 4, 32) for k, v in fake_collator(4, 32, 64, 0).items()}
    eng.train_step(batch, 1)
    after = jax.device_get(eng.params)

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree.leaves(after)
    changed, frozen = [], []
    for (path, b), a in zip(flat_b, flat_a):
        keys = [getattr(k, "key", "") for k in path]
        moved = not np.allclose(np.asarray(b), np.asarray(a))
        if any(k in ("lora_a", "lora_b") for k in keys):
            changed.append((keys, moved))
        else:
            frozen.append((keys, moved))
    # lora_b starts at zero so lora_a has zero grad on step 1; lora_b must move
    assert any(m for k, m in changed if "lora_b" in k), "lora_b did not update"
    assert not any(m for _, m in frozen), f"frozen param moved: {[k for k, m in frozen if m]}"


def test_merge_lora_matches_unmerged_forward():
    from xtuner_tpu.data_proto import SequenceContext
    from xtuner_tpu.module.params import init_params

    cfg = lora_cfg_model()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(1))
    # give lora_b nonzero values so the adapters actually contribute
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.01 if any(getattr(k, "key", "") == "lora_b" for k in path) else p,
        params,
    )
    ids = np.random.default_rng(0).integers(1, 64, (1, 16)).astype(np.int32)
    ctx = SequenceContext.from_input_ids(ids)
    out_lora = model.forward(params, ctx, compute_dtype=jnp.float32)

    merged = merge_lora(params, cfg.lora_cfg.scaling)
    plain_model = cfg.model_copy(update={"lora_cfg": None}).build()
    out_merged = plain_model.forward(merged, ctx, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_merged),
                               rtol=1e-5, atol=1e-5)


def test_lora_load_from_hf(tmp_path):
    """Base weights from HF checkpoint; adapters random-initialized."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                         head_dim=8, tie_word_embeddings=False)
    torch.manual_seed(0)
    Qwen3ForCausalLM(hf_cfg).save_pretrained(tmp_path, safe_serialization=True)

    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint
    from xtuner_tpu.module.params import param_shardings
    from xtuner_tpu.parallel import build_mesh

    cfg = lora_cfg_model(tie_word_embeddings=False)
    cfg = cfg.model_copy(update={"attention": MHAConfig(
        num_attention_heads=4, num_key_value_heads=2, head_dim=8, qk_norm=True)})
    model = cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig()
    shardings = param_shardings(specs, build_mesh(mesh_cfg), mesh_cfg.rules())
    params = load_hf_checkpoint(tmp_path, specs, model.hf_key_map(), shardings)
    assert np.allclose(np.asarray(params["layers"]["attn"]["q_proj"]["lora_b"]), 0.0)
    assert np.abs(np.asarray(params["layers"]["attn"]["q_proj"]["lora_a"])).sum() > 0
