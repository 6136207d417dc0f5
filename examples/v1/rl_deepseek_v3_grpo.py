"""BASELINE config 5: DeepSeek-V3-scale MoE @ 64k with Ulysses SP + GRPO RL
(rollouts served by the live training params on the same mesh).

    python -m xtuner_tpu.train.cli.rl --config examples/v1/rl_deepseek_v3_grpo.py
"""

from xtuner_tpu.config import AdamWConfig, MeshConfig
from xtuner_tpu.model.deepseek import deepseek_v3
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.rl.evaluator import EvaluatorConfig
from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
from xtuner_tpu.rl.trainer import RLTrainerConfig

model = deepseek_v3().model_copy(update={"dispatcher": "a2a", "mtp_num_layers": 0})

trainer = RLTrainerConfig(
    model_cfg=model,
    prompts_path="/data/gsm8k_train.jsonl",
    optim_cfg=AdamWConfig(lr=1e-6),
    mesh_cfg=MeshConfig(fsdp_size=-1, ep_size=8, sp_size=4, remat_policy="save_attn"),
    loss_cfg=GRPOLossConfig(cliprange_low=0.2, cliprange_high=0.2, kl_coef=0.001),
    gen_cfg=GenerateConfig(max_new_tokens=1024, temperature=1.0, top_p=1.0),
    group_size=8,
    prompts_per_step=64,
    total_steps=500,
    max_prompt_length=1024,
    judger="gsm8k",
    advantage="grpo",
    load_from="/path/to/DeepSeek-V3",
    tokenizer_path="/path/to/DeepSeek-V3",
    eval_cfg=EvaluatorConfig(eval_path="/data/gsm8k_test.jsonl",
                             samples_per_prompt=4, pass_k=[1, 4], eval_interval=50),
    work_dir="work_dirs",
    exp_name="dsv3_grpo",
)
