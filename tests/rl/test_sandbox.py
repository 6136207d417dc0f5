"""Sandbox agent loop (reference rl/agent_loop/sandbox_agent_loop/)."""

import numpy as np

from xtuner_tpu.rl.sandbox import PythonSandbox, SandboxAgentLoop, SandboxConfig
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def test_sandbox_runs_code():
    sb = PythonSandbox()
    assert sb.run("print(21 * 2)") == "42"
    assert "[exit" in sb.run("import sys; sys.exit(3)")
    assert "NameError" in sb.run("print(undefined_var)")


def test_sandbox_timeout_and_truncation():
    sb = PythonSandbox(SandboxConfig(timeout_s=1.0, max_output_chars=50))
    assert "[timeout" in sb.run("while True: pass")
    out = sb.run("print('x' * 10000)")
    assert out.endswith("[truncated]") and len(out) < 100


def test_sandbox_agent_loop_fenced_code():
    tok = UTF8ByteTokenizer()
    responses = iter([
        "let me compute:\n```python\nprint(6 * 7)\n```",
        "the answer is 42",
    ])

    def gen(ctx):
        ids = tok.encode(next(responses), add_special_tokens=False)
        return ids, [0.0] * len(ids)

    loop = SandboxAgentLoop(gen, tok, max_turns=3)
    r = loop.run(tok.encode("what is 6*7?", add_special_tokens=False))
    assert r.stop_reason == "answer" and r.num_turns == 2
    # the tool result fed back between generations contains the output
    text = tok.decode([t for s in r.segments for t in s.ids])
    assert "<tool_result>42</tool_result>" in text
    # only policy tokens are marked generated
    flat_ids, gen_mask, _ = r.flatten()
    sup_text = tok.decode([t for t, g in zip(flat_ids, gen_mask) if g])
    assert "42</tool_result>" not in sup_text and "the answer is 42" in sup_text


def test_sandbox_agent_loop_tool_call_json():
    tok = UTF8ByteTokenizer()
    responses = iter([
        '<tool_call>{"name": "python", "arguments": "print(5+5)"}</tool_call>',
        "done: 10",
    ])

    def gen(ctx):
        ids = tok.encode(next(responses), add_special_tokens=False)
        return ids, [0.0] * len(ids)

    loop = SandboxAgentLoop(gen, tok, max_turns=3)
    r = loop.run(tok.encode("compute", add_special_tokens=False))
    text = tok.decode([t for s in r.segments for t in s.ids])
    assert "10" in text and r.stop_reason == "answer"
