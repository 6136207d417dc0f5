"""Tiny GRPO RL config (toy tokenizer, CPU/TPU-runnable).

    python -m xtuner_tpu.train.cli.rl --config examples/rl_tiny.py
"""

import json
from pathlib import Path

from xtuner_tpu.config import AdamWConfig, CELossConfig, MeshConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
from xtuner_tpu.rl.trainer import RLTrainerConfig

_HERE = Path(__file__).parent
_PROMPTS = _HERE / "demo_data" / "gsm8k_tiny.jsonl"
if not _PROMPTS.exists():
    with open(_PROMPTS, "w") as f:
        for i in range(16):
            f.write(json.dumps({
                "prompt": f"What is {i} plus {i + 1}?",
                "label": f"#### {2 * i + 1}",
            }) + "\n")

trainer = RLTrainerConfig(
    model_cfg=DenseConfig(
        vocab_size=300,
        num_hidden_layers=2,
        hidden_size=64,
        intermediate_size=128,
        eos_token_id=258,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16),
        lm_loss_cfg=CELossConfig(chunk_size=256),
    ),
    prompts_path=str(_PROMPTS),
    optim_cfg=AdamWConfig(lr=1e-5),
    mesh_cfg=MeshConfig(param_dtype="float32"),
    loss_cfg=GRPOLossConfig(),
    gen_cfg=GenerateConfig(max_new_tokens=16, temperature=1.0, eos_token_id=258),
    group_size=4,
    prompts_per_step=2,
    total_steps=4,
    max_prompt_length=48,
    work_dir="work_dirs",
    exp_name="rl_tiny",
)
