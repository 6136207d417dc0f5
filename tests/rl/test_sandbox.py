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


# ---------------------------------------------------------------------------
# persistent sessions / pool / staged rollout (reference sandbox.py depth)

from xtuner_tpu.rl.sandbox import (  # noqa: E402
    SandboxPool, SandboxSession, StagedSandboxRollout)


def test_session_state_persists_across_calls():
    s = SandboxSession()
    try:
        assert s.exec("x = 41") == "[no output]"
        assert s.exec("x += 1\nprint(x)") == "42"
        assert "NameError" in s.exec("print(never_defined)")
        # the error did not kill the interpreter or its state
        assert s.exec("print(x)") == "42"
    finally:
        s.close()


def test_session_timeout_kills_and_restart_recovers():
    s = SandboxSession(SandboxConfig(timeout_s=1.0))
    try:
        s.exec("x = 1")
        assert "[timeout" in s.exec("while True: pass")
        assert not s.alive()
        assert s.exec("print(1)") == "[sandbox session dead]"
        s.restart()
        assert s.alive()
        # fresh interpreter: old state gone
        assert "NameError" in s.exec("print(x)")
    finally:
        s.close()


def test_session_upload_and_workdir_isolation(tmp_path):
    s = SandboxSession()
    try:
        s.upload({"data/input.txt": "7 35", "script.py": "print('hi')"})
        out = s.exec("print(open('data/input.txt').read())")
        assert out == "7 35"
        # path escape is rejected parent-side
        import pytest
        with pytest.raises(ValueError):
            s.upload({"../escape.txt": "nope"})
    finally:
        s.close()


def test_pool_reuse_restart_and_eviction():
    pool = SandboxPool(max_sessions=2)
    try:
        a = pool.get("a")
        a.exec("x = 1")
        assert pool.get("a") is a  # reuse keeps state
        assert pool.get("a").exec("print(x)") == "1"
        # dead session is transparently restarted on acquire
        a.proc.kill()
        a.proc.wait()
        a2 = pool.get("a")
        assert a2.alive() and pool.restarts == 1
        pool.get("b")
        pool.get("c")  # evicts the coldest
        assert len(pool.sessions) == 2
    finally:
        pool.release_all()
        assert not pool.sessions


def _scripted_gen(tok, responses):
    it = iter(responses)

    def gen(ctx):
        ids = tok.encode(next(it), add_special_tokens=False)
        return ids, [0.0] * len(ids)
    return gen


def test_staged_rollout_gsm8k_calculator_e2e():
    """gsm8k-with-calculator style: setup stages the problem data, the agent
    computes with the python tool across turns (state persists), the judge
    inspects session state to score (VERDICT r3 item 7 done-condition)."""
    tok = UTF8ByteTokenizer()
    gen = _scripted_gen(tok, [
        "read the problem:\n```python\nparts = open('q.txt').read().split()\n"
        "a, b = int(parts[0]), int(parts[1])\nprint(a, b)\n```",
        '<tool_call>{"name": "python", "arguments": "answer = a * b\\nprint(answer)"}</tool_call>',
        "The answer is 245.",
    ])
    staged = StagedSandboxRollout(
        gen, tok, max_turns=4,
        files={"q.txt": "7 35"},
        setup=("import math",),
        judge_code="print(1.0 if answer == 245 else 0.0)")
    res = staged.run("item0", tok.encode("Q: 7 * 35?", add_special_tokens=False))
    assert res.ok and res.reward == 1.0
    kinds = [r.kind for r in res.records]
    assert kinds == ["setup", "turn", "turn", "judge"]
    assert all(r.ok for r in res.records)
    assert res.rollout.stop_reason == "answer"
    # tool outputs are loss-masked, agent tokens supervised
    _, gen_mask, _ = res.rollout.flatten()
    assert any(gen_mask) and not all(gen_mask)
    staged.pool.release_all()


def test_staged_rollout_setup_failure_retries_then_fails():
    tok = UTF8ByteTokenizer()

    def gen(ctx):  # pragma: no cover - setup fails before any generation
        raise AssertionError("agent should not run")

    staged = StagedSandboxRollout(
        gen, tok, setup=("raise RuntimeError('bad setup')",), max_retries=1)
    res = staged.run("it", [1, 2])
    assert not res.ok and res.attempts == 2 and "setup" in res.fail_reason
    staged.pool.release_all()


def test_per_turn_judger_early_termination():
    tok = UTF8ByteTokenizer()
    gen = _scripted_gen(tok, [
        "thinking...\n```python\nprint(2+2)\n```",
        "final: 4",
        "SHOULD NEVER GENERATE",
    ])

    def judger(text):
        return 1.0 if "final: 4" in text else None

    staged = StagedSandboxRollout(gen, tok, max_turns=5, per_turn_judger=judger)
    res = staged.run("it", tok.encode("2+2?", add_special_tokens=False))
    assert res.ok and res.reward == 1.0
    assert res.rollout.stop_reason == "judged" and res.rollout.num_turns == 2
    staged.pool.release_all()


def test_judge_fn_parent_side():
    tok = UTF8ByteTokenizer()
    gen = _scripted_gen(tok, ["the answer is 9"])

    def judge(final_text, session):
        # the judge can also poke the live session
        assert session.exec("print('alive')") == "alive"
        return 0.5 if "9" in final_text else 0.0

    staged = StagedSandboxRollout(gen, tok, judge_fn=judge)
    res = staged.run("it", tok.encode("3*3?", add_special_tokens=False))
    assert res.ok and res.reward == 0.5
    staged.pool.release_all()


def test_staged_rollout_against_native_paged_worker():
    """E2E: the staged sandbox rollout driven by a LIVE RolloutWorker over
    HTTP (VERDICT r3 item 7 e2e condition). A tiny random model rambles —
    the staged machinery (setup, session-tool turns, judge-in-session) must
    still run to completion and the judge scores deterministic session
    state."""
    import jax

    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.params import init_params
    from xtuner_tpu.rl.rollout_client import RolloutClient, RolloutClientConfig
    from xtuner_tpu.rl.worker import RolloutWorker

    tok = UTF8ByteTokenizer()
    cfg = DenseConfig(
        vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=258,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=128),
    )
    params = jax.tree.map(lambda x: x.astype(jax.numpy.float32),
                          init_params(cfg.build().param_specs(), jax.random.key(0)))
    w = RolloutWorker(cfg, params=params, tokenizer=tok,
                      gen_cfg=GenerateConfig(max_new_tokens=8, eos_token_id=258),
                      compute_dtype=jax.numpy.float32)
    w.start()
    try:
        client = RolloutClient(RolloutClientConfig(base_url=w.base_url))
        gen = client.generate_fn(tok, max_tokens=8, temperature=0.0)
        staged = StagedSandboxRollout(
            gen, tok, max_turns=2,
            setup=("meaning = 42",),
            judge_code="print(1.0 if meaning == 42 else 0.0)")
        res = staged.run("e2e", tok.encode("Q: ?", add_special_tokens=False))
        assert res.ok and res.reward == 1.0
        assert res.rollout is not None and res.rollout.num_turns >= 1
        assert [r.kind for r in res.records][0] == "setup"
        assert res.records[-1].kind == "judge"
        staged.pool.release_all()
    finally:
        w.stop()
