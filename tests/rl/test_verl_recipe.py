"""verl tool-agent recipe (recipe/verl_agent): YAML tool config, the
server-manager shim, the gsm8k reward tool, masked multi-turn rollouts, and
the sandbox code tool. Reference behavior:
recipe/verl_agent/sandbox_example/test_verl_tool_agent_loop.py."""

import json

from recipe.verl_agent.common.agent_loop_verl_tool import (
    Gsm8kTool,
    SandboxCodeTool,
    VerlToolAgentLoopConfig,
    XtunerServerManager,
    load_tool_config,
    tool_call_text,
)
from recipe.verl_agent.gsm8k_tool_example.gsm8k_tool_grpo_config import (
    TOOL_CONFIG,
    rollout_group,
)
from xtuner_tpu.rl.judger import GSM8KJudger
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def scripted_generate(script):
    state = {"i": 0}
    tok = UTF8ByteTokenizer()

    def fn(context_ids):
        text = script[min(state["i"], len(script) - 1)]
        state["i"] += 1
        ids = tok.encode(text)
        return ids, [-0.25] * len(ids)

    return fn, tok


def test_yaml_tool_config_resolves_verl_class_to_native():
    registry = load_tool_config(TOOL_CONFIG)
    assert list(registry.tools) == ["calc_gsm8k_reward"]
    assert isinstance(registry.tools["calc_gsm8k_reward"], Gsm8kTool)
    schema = registry.schemas[0]["function"]
    assert schema["parameters"]["required"] == ["answer"]


def test_gsm8k_tool_scores_against_instance_ground_truth():
    tool = Gsm8kTool({}, {"function": {"name": "calc_gsm8k_reward"}})
    tool.create_instance("s1", ground_truth="72")
    text, reward, _ = tool.execute("s1", {"answer": "the answer is 72"})
    assert reward == 1.0 and "reward=1.0" in text
    _, reward, _ = tool.execute("s1", {"answer": "71"})
    assert reward == 0.0


def test_tool_loop_e2e_masks_and_judges():
    """Policy checks a wrong answer with the tool, corrects, gets judged."""
    call = tool_call_text("calc_gsm8k_reward", {"answer": "71"})
    gen, tok = scripted_generate([
        f"let me verify {call}",
        "so the true answer is #### 72",
    ])
    cfg = VerlToolAgentLoopConfig(tool_config_path=TOOL_CONFIG, max_turns=4)
    loop = cfg.build(XtunerServerManager(generate_fn=gen), tok,
                     judger=GSM8KJudger())
    prompt = tok.encode("Q: 36+36?")
    state = loop.generate_sample(
        prompt, session_id="sess0",
        tools_kwargs={"calc_gsm8k_reward": {"create_kwargs": {"ground_truth": "72"}}},
        ground_truth="72")
    assert state.status == "completed"
    assert state.num_turns == 2
    assert state.reward == 1.0  # final #### 72 judged correct
    # the tool saw the mid-rollout answer and reported reward=0.0 back
    assert "reward=0.0" in state.response
    # tool-response tokens are loss-masked, policy tokens supervised
    assert set(state.response_mask) == {0, 1}
    gen_text = tok.decode([t for t, m in zip(state.response_ids, state.response_mask) if m])
    masked_text = tok.decode([t for t, m in zip(state.response_ids, state.response_mask) if not m])
    assert "#### 72" in gen_text
    assert "reward=0.0" in masked_text
    assert "reward=0.0" not in gen_text
    assert len(state.logprobs) == len(state.response_ids)


def test_rollout_group_packs_grpo_batch():
    call = tool_call_text("calc_gsm8k_reward", {"answer": "5"})
    gen, tok = scripted_generate([
        f"check {call}",
        "final #### 5",
    ] * 3)
    batch, rewards = rollout_group(gen, tok, "What is 2+3?", "#### 5",
                                   group_size=2, max_len=512)
    assert rewards == [1.0, 1.0]
    assert batch["input_ids"].shape == (1, 2, 512)
    labels = batch["shifted_labels"][0, 0]
    assert (labels != -100).sum() > 0
    # group-mean baseline: equal rewards -> zero advantage everywhere
    assert float(batch["advantages"].max()) == 0.0


def test_sandbox_code_tool_executes_fenced_block():
    tool = SandboxCodeTool({"timeout_s": 10.0},
                           {"function": {"name": "code_interpreter"}})
    text, reward, _ = tool.execute("s0", {"code": "```py\nx = 6 * 7\nx\n```"})
    assert "42" in text
    assert reward == 0.0


def test_failed_rollout_reports_status():
    def boom(_ids):
        raise RuntimeError("backend down")

    tok = UTF8ByteTokenizer()
    cfg = VerlToolAgentLoopConfig(tool_config_path=TOOL_CONFIG)
    loop = cfg.build(XtunerServerManager(generate_fn=boom), tok)
    state = loop.generate_sample(tok.encode("q"), session_id="f0")
    assert state.status == "failed"
    assert "backend down" in state.error_msg
