"""GSM8K-with-reward-tool GRPO recipe (reference:
recipe/verl_agent/gsm8k_tool_example/gsm8k_tool_grpo_config.py — a GRPO run
whose rollouts may call ``calc_gsm8k_reward`` mid-trajectory via verl's
ToolAgentLoop; tool turns are loss-masked, the final answer is judged).

TPU shape: same pieces on the native stack — RLTrainerConfig for the
colocate GRPO trainer, VerlToolAgentLoopConfig for the tool loop, and
``rollout_group`` showing how the loop's masked rollouts become a GRPO batch
(pack_agent_rollouts). Sized tiny so it executes on one chip / CPU; scale
knobs mirror the reference's (train_batch_size=64, prompt_repeat_k=5,
pack_max_length=32k).
"""

import json
import os
from pathlib import Path

from recipe.verl_agent.common.agent_loop_verl_tool import (
    VerlToolAgentLoopConfig,
    XtunerServerManager,
)
from xtuner_tpu.config import AdamWConfig, CELossConfig, MeshConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.rl.agent_loop import pack_agent_rollouts
from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
from xtuner_tpu.rl.judger import GSM8KJudger
from xtuner_tpu.rl.trainer import RLTrainerConfig

_HERE = Path(__file__).parent
TOOL_CONFIG = str(_HERE / "tool_config" / "gsm8k_tool_config.yaml")

# reference scale knobs (gsm8k_tool_grpo_config.py:33-41); the tiny model
# below keeps the recipe executable on one chip — swap model_cfg/load_from
# for a real checkpoint to reproduce the reference run
prompt_repeat_k = int(os.environ.get("PROMPT_REPEAT_K", 5))
max_response_length = 1024

_PROMPTS = _HERE / "gsm8k_tool_tiny.jsonl"
if not _PROMPTS.exists():
    with open(_PROMPTS, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "prompt": f"What is {i} plus {i + 1}? You may call "
                          f"calc_gsm8k_reward to check an answer first.",
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
    optim_cfg=AdamWConfig(lr=1e-6),
    mesh_cfg=MeshConfig(param_dtype="float32"),
    loss_cfg=GRPOLossConfig(cliprange_high=0.28, cliprange_low=0.2),
    gen_cfg=GenerateConfig(max_new_tokens=32, temperature=1.0, eos_token_id=258),
    group_size=prompt_repeat_k,
    prompts_per_step=2,
    total_steps=4,
    max_prompt_length=128,
    judger="gsm8k",
    work_dir="work_dirs",
    exp_name="verl_gsm8k_tool",
)

agent_loop = VerlToolAgentLoopConfig(
    tool_config_path=TOOL_CONFIG,
    max_turns=4,
    max_tokens=max_response_length,
)


def rollout_group(generate_fn, tokenizer, prompt: str, ground_truth: str,
                  group_size: int = prompt_repeat_k, max_len: int = 512):
    """One GRPO group through the tool loop -> packed train batch.

    generate_fn(prompt_ids) -> (ids, logprobs): the engine's sampler or a
    RolloutClient.generate_fn — whatever backs XtunerServerManager.
    """
    loop = agent_loop.build(XtunerServerManager(generate_fn=generate_fn),
                            tokenizer, judger=GSM8KJudger())
    rollouts, rewards = [], []
    for g in range(group_size):
        state = loop.generate_sample(
            tokenizer.encode(prompt), session_id=f"g{g}",
            tools_kwargs={"calc_gsm8k_reward":
                          {"create_kwargs": {"ground_truth": ground_truth}}},
            ground_truth=ground_truth)
        rollouts.append(state)
        rewards.append(state.reward or 0.0)
    mean = sum(rewards) / len(rewards)
    advantages = [r - mean for r in rewards]
    packed = [_as_agent_rollout(s, tokenizer) for s in rollouts]
    return pack_agent_rollouts(packed, advantages, max_len=max_len), rewards


def _as_agent_rollout(state, tokenizer):
    """VerlRolloutState -> the Segment view pack_agent_rollouts consumes."""
    from xtuner_tpu.rl.agent_loop import AgentRollout, Segment

    r = AgentRollout()
    r.segments.append(Segment(list(state.prompt_ids), generated=False))
    ids, mask, lps = state.response_ids, state.response_mask, state.logprobs
    i = 0
    while i < len(ids):
        j = i
        while j < len(ids) and mask[j] == mask[i]:
            j += 1
        r.segments.append(Segment(ids[i:j], generated=bool(mask[i]),
                                  logprobs=lps[i:j] if mask[i] else None))
        i = j
    r.final_text = state.response
    r.num_turns = state.num_turns
    return r
