"""Multi-turn tool agent loop: tool invocation, loss masks on generated tokens."""

import numpy as np

from xtuner_tpu.rl.agent_loop import ToolAgentLoop, pack_agent_rollouts
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def scripted_generate(script):
    """Returns a generate_fn that replays scripted responses in order."""
    state = {"i": 0}
    tok = UTF8ByteTokenizer()

    def fn(context_ids):
        text = script[min(state["i"], len(script) - 1)]
        state["i"] += 1
        ids = tok.encode(text)
        return ids, [-0.5] * len(ids)

    return fn, tok


def test_tool_loop_invokes_and_stops():
    calls = []

    def calculator(args):
        calls.append(args)
        return str(eval(args, {"__builtins__": {}}))

    gen, tok = scripted_generate([
        "let me compute <tool_call>calc(2+3)</tool_call>",
        "the answer is 5",
    ])
    loop = ToolAgentLoop(gen, tok, {"calc": calculator}, max_turns=4)
    prompt = tok.encode("what is 2+3?")
    rollout = loop.run(prompt)
    assert calls == ["2+3"]
    assert rollout.num_turns == 2
    assert rollout.stop_reason == "answer"
    # segments: prompt(F), gen(T), tool result(F), gen(T)
    flags = [s.generated for s in rollout.segments]
    assert flags == [False, True, False, True]
    assert "<tool_result>5</tool_result>" in tok.decode(rollout.segments[2].ids)


def test_unknown_tool_and_max_turns():
    gen, tok = scripted_generate(["<tool_call>nope(1)</tool_call>"])
    loop = ToolAgentLoop(gen, tok, {}, max_turns=2)
    rollout = loop.run(tok.encode("q"))
    assert rollout.stop_reason == "max_turns"
    assert "unknown tool" in tok.decode(rollout.segments[2].ids)


def test_pack_masks_tool_results():
    def echo(args):
        return "RESULT"

    gen, tok = scripted_generate([
        "<tool_call>echo(x)</tool_call>",
        "done",
    ])
    loop = ToolAgentLoop(gen, tok, {"echo": echo}, max_turns=3)
    rollout = loop.run(tok.encode("hi "))
    batch = pack_agent_rollouts([rollout], [1.0], max_len=200)
    labels = batch["shifted_labels"][0, 0]
    ids = batch["input_ids"][0, 0]
    flat_ids, gen_mask, _ = rollout.flatten()
    # every supervised label equals the next token AND that token was generated
    for t in range(len(flat_ids) - 1):
        if labels[t] != -100:
            assert labels[t] == flat_ids[t + 1]
            assert gen_mask[t + 1]
    # tool-result tokens never appear as labels
    supervised_count = int((labels != -100).sum())
    generated_count = sum(gen_mask[1:])
    assert supervised_count == generated_count
    assert batch["advantages"][0, 0][labels != -100].min() == 1.0
