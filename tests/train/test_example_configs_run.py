"""North-star example configs execute REAL train steps (round-2 weak #9:
construction-smoke alone never ran a step through these surfaces).

Each SFT example's TrainerConfig is shrunk in place — tiny model dims of the
SAME model/attention classes, placeholder checkpoint paths dropped (random
init + toy tokenizer), a generated openai-format dataset — and `fit()` runs
2 optimizer steps end-to-end (dataloader -> pack -> engine -> checkpoint)."""

import json
from pathlib import Path

import pytest

from xtuner_tpu.utils.config import Config

EXAMPLES = Path(__file__).parents[2] / "examples" / "v1"
SFT_CONFIGS = [
    "sft_qwen3_8b_32k.py",      # dense long-context north star
    "sft_qwen3_moe_30b.py",     # dropless MoE north star
    "sft_gpt_oss_20b.py",       # sinks + window pattern + clipped swiglu
    "sft_glm52_dsa.py",         # DSA sparse MLA + noaux + MTP
    "sft_qwen35_hybrid.py",     # GatedDeltaNet hybrid
    "sft_qwen25_05b_lora.py",   # LoRA fine-tune
]


def _shrink_attention(attn):
    upd = {}
    fields = type(attn).model_fields
    for f, v in (("num_attention_heads", 4), ("num_key_value_heads", 2),
                 ("head_dim", 16), ("q_lora_rank", None), ("kv_lora_rank", 32),
                 ("qk_nope_head_dim", 16), ("qk_rope_head_dim", 16),
                 ("v_head_dim", 16), ("index_n_heads", 2),
                 ("index_head_dim", 16), ("index_top_k", 64)):
        if f in fields:
            upd[f] = v
    return attn.model_copy(update=upd)


def _shrink_model(mc):
    fields = type(mc).model_fields
    upd = {}
    for f, v in (("num_hidden_layers", 2), ("hidden_size", 64),
                 ("intermediate_size", 128), ("moe_intermediate_size", 64),
                 ("n_routed_experts", 4), ("num_experts_per_tok", 2),
                 ("vocab_size", 512), ("eos_token_id", 258),
                 ("pad_token_id", 0),
                 ("mtp_num_layers", 0), ("max_position_embeddings", 2048)):
        if f in fields:
            upd[f] = v
    if "first_k_dense_replace" in fields:  # keep 0 where the family has none
        upd["first_k_dense_replace"] = min(mc.first_k_dense_replace, 1)
    if "router" in fields and getattr(mc.router, "n_group", 1) > 1:
        # group-limited noaux routing must divide the shrunk expert count
        upd["router"] = mc.router.model_copy(update={"n_group": 2,
                                                     "topk_group": 1})
    if "layer_types_pattern" in fields:
        upd["layer_types_pattern"] = ["linear", "full"]
        upd["num_hidden_layers"] = 2
    if "layer_window_pattern" in fields and mc.layer_window_pattern:
        upd["layer_window_pattern"] = [64, None]
    if "linear_attention" in fields:
        la = mc.linear_attention
        la_upd = {k: v for k, v in (("num_v_heads", 4), ("num_k_heads", 2),
                                    ("head_k_dim", 16), ("head_v_dim", 16),
                                    ("conv_kernel_size", 4))
                  if k in type(la).model_fields}
        upd["linear_attention"] = la.model_copy(update=la_upd)
    if "attention" in fields:
        upd["attention"] = _shrink_attention(mc.attention)
    if "lora_cfg" in fields and mc.lora_cfg is not None:
        upd["lora_cfg"] = mc.lora_cfg.model_copy(update={"r": 4})
    if "rope_scaling_cfg" in fields:
        upd["rope_scaling_cfg"] = None
    return mc.model_copy(update=upd)


def _fake_dataset(tmp_path: Path, n: int = 32) -> str:
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({"messages": [
                {"role": "user", "content": f"what is {i} + {i}?"},
                {"role": "assistant", "content": f"it is {2 * i}."},
            ]}) + "\n")
    return str(p)


@pytest.mark.slow
@pytest.mark.parametrize("name", SFT_CONFIGS)
def test_sft_example_runs_real_steps(name, tmp_path):
    from xtuner_tpu.parallel.mesh import MeshConfig

    cfg = Config.fromfile(str(EXAMPLES / name))["trainer"]
    dl = cfg.dataloader_cfg
    dl = dl.model_copy(update={
        "datasets": [dl.datasets[0].model_copy(update={
            "anno_path": _fake_dataset(tmp_path)})],
        "pack_max_length": 512, "num_workers": 0, "cache_dir": None,
    })
    cfg = cfg.model_copy(update={
        "model_cfg": _shrink_model(cfg.model_cfg),
        "dataloader_cfg": dl,
        "mesh_cfg": MeshConfig(fsdp_size=-1, param_dtype="float32",
                               remat_policy=cfg.mesh_cfg.remat_policy
                               if cfg.mesh_cfg.remat_policy != "offload_attn"
                               else "save_out_lse"),
        "global_batch_rows": 8, "micro_batch_rows": 8,
        "total_steps": 2, "epochs": 1.0,
        "load_from": None, "tokenizer_path": None,
        "checkpoint_interval": None, "snapshot_interval": None,
        "hf_interval": None,
        "work_dir": str(tmp_path / "work"), "exp_name": f"smoke_{name[:-3]}",
    })
    trainer = cfg.build()
    trainer.fit()
    tracker = Path(cfg.work_dir) / cfg.exp_name / "tracker.jsonl"
    recs = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(recs) >= 2
    import math
    assert math.isfinite(recs[-1]["reduced_llm_loss"])


def _fake_pref_dataset(tmp_path: Path, n: int = 16) -> str:
    p = tmp_path / "pref.jsonl"
    with open(p, "w") as f:
        for i in range(n):
            user = {"role": "user", "content": f"pick a number near {i}"}
            f.write(json.dumps({
                "chosen": [user,
                           {"role": "assistant", "content": f"about {i}."}],
                "rejected": [user,
                             {"role": "assistant", "content": "no idea!!"}],
            }) + "\n")
    return str(p)


@pytest.mark.slow
def test_dpo_example_runs_real_steps(tmp_path):
    """examples/v1/dpo_qwen3_8b.py executes 2 real preference steps."""
    import math

    from xtuner_tpu.parallel.mesh import MeshConfig

    cfg = Config.fromfile(str(EXAMPLES / "dpo_qwen3_8b.py"))["trainer"]
    cfg = cfg.model_copy(update={
        "model_cfg": _shrink_model(cfg.model_cfg),
        "data_path": _fake_pref_dataset(tmp_path),
        "mesh_cfg": MeshConfig(fsdp_size=-1, param_dtype="float32"),
        "pairs_per_step": 4, "max_length": 256, "total_steps": 2,
        "load_from": None, "tokenizer_path": None,
        "work_dir": str(tmp_path / "work"), "exp_name": "smoke_dpo",
    })
    trainer = cfg.build()
    trainer.fit()
    tracker = Path(cfg.work_dir) / cfg.exp_name / "tracker.jsonl"
    recs = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(recs) >= 2
    assert math.isfinite(recs[-1]["total_loss"])
    assert "reward_acc" in recs[-1]


@pytest.mark.slow
def test_rl_example_runs_real_steps(tmp_path):
    """examples/v1/rl_deepseek_v3_grpo.py (DeepSeek-V3 MLA MoE + GRPO)
    executes 2 real rollout+train steps through RLColocateTrainer."""
    import math

    from xtuner_tpu.parallel.mesh import MeshConfig

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"What is {i} plus {i}?",
                                "label": f"#### {2 * i}"}) + "\n")

    cfg = Config.fromfile(str(EXAMPLES / "rl_deepseek_v3_grpo.py"))["trainer"]
    cfg = cfg.model_copy(update={
        "model_cfg": _shrink_model(cfg.model_cfg),
        "prompts_path": str(prompts),
        "mesh_cfg": MeshConfig(fsdp_size=-1, param_dtype="float32"),
        "gen_cfg": cfg.gen_cfg.model_copy(update={
            "max_new_tokens": 8, "eos_token_id": 258}),
        "group_size": 4, "prompts_per_step": 2, "total_steps": 2,
        "max_prompt_length": 56,
        "load_from": None, "tokenizer_path": None, "eval_cfg": None,
        "work_dir": str(tmp_path / "work"), "exp_name": "smoke_rl",
    })
    trainer = cfg.build()
    trainer.fit()
    tracker = Path(cfg.work_dir) / cfg.exp_name / "tracker.jsonl"
    recs = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(recs) >= 2
    assert math.isfinite(recs[-1]["total_loss"])


@pytest.mark.slow
def test_vlm_example_runs_real_steps(tmp_path, monkeypatch):
    """examples/v1/sft_internvl_8b_vlm.py (Compose VLM + internvl tiling
    dataset) executes 2 real train steps with image inputs."""
    import math

    import numpy as np

    from xtuner_tpu.model.vision import ViTConfig
    from xtuner_tpu.parallel.mesh import MeshConfig
    from xtuner_tpu.train import trainer as trainer_mod
    from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data = tmp_path / "vlm.jsonl"
    with open(data, "w") as f:
        for i in range(16):
            img_path = img_dir / f"{i}.npy"
            np.save(img_path,
                    rng.integers(0, 255, (56, 28, 3)).astype(np.uint8))
            f.write(json.dumps({"messages": [
                {"role": "user", "content": [
                    {"type": "image", "image": str(img_path)},
                    {"type": "text", "text": f"describe image {i}"},
                ]},
                {"role": "assistant", "content": f"image {i} shows noise"},
            ]}) + "\n")

    monkeypatch.setattr(
        trainer_mod.Trainer, "_build_tokenizer",
        lambda self: UTF8ByteTokenizer(
            extra_specials=["<img>", "</img>", "<IMG_CONTEXT>"]))

    cfg = Config.fromfile(str(EXAMPLES / "sft_internvl_8b_vlm.py"))["trainer"]
    mc = cfg.model_cfg
    text = _shrink_model(mc.text_cfg).model_copy(update={"vocab_size": 262})
    mc = mc.model_copy(update={
        "vision_cfg": ViTConfig(image_size=28, patch_size=7, hidden_size=16,
                                intermediate_size=32, num_hidden_layers=2,
                                num_attention_heads=2, downsample_ratio=0.5),
        "text_cfg": text,
        "image_context_token_id": 261,
    })
    dl = cfg.dataloader_cfg
    dl = dl.model_copy(update={
        "datasets": [dl.datasets[0].model_copy(update={
            "anno_path": str(data)})],
        "pack_max_length": 256, "num_workers": 0, "cache_dir": None,
        "max_tiles": 48, "tokens_per_tile": 4, "image_size": 28,
        "image_max_num": 2,
    })
    cfg = cfg.model_copy(update={
        "model_cfg": mc, "dataloader_cfg": dl,
        "mesh_cfg": MeshConfig(fsdp_size=-1, param_dtype="float32"),
        "global_batch_rows": 8, "micro_batch_rows": 8,
        "total_steps": 2, "epochs": 1.0,
        "load_from": None, "tokenizer_path": None,
        "checkpoint_interval": None, "snapshot_interval": None,
        "hf_interval": None,
        "work_dir": str(tmp_path / "work"), "exp_name": "smoke_vlm",
    })
    trainer = cfg.build()
    trainer.fit()
    tracker = Path(cfg.work_dir) / cfg.exp_name / "tracker.jsonl"
    recs = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(recs) >= 2
    assert math.isfinite(recs[-1]["reduced_llm_loss"])
