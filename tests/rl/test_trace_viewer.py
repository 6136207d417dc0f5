"""Trace viewer recipe (recipe/trace): payload aggregation over the local
trace stores and the HTTP surface. Reference behavior:
recipe/trace/viewer/{payload,render,server}.py (Jaeger-backed there)."""

import json
import threading
import urllib.request

from recipe.trace.viewer import payload, render
from recipe.trace.viewer.server import make_server
from xtuner_tpu.rl.replay_buffer import SampleGroup
from xtuner_tpu.rl.spans import SpanTracer
from xtuner_tpu.rl.trace import RolloutTraceStore


class _Tok:
    def decode(self, ids):
        return "resp:" + ",".join(map(str, ids))


def _fake_run(tmp_path):
    store = RolloutTraceStore(tmp_path, enabled=True)
    for step in (1, 2):
        groups = [SampleGroup(prompt_id=p, policy_version=step, samples=[
            {"prompt_ids": [1, 2], "response_ids": [3, 4, 5],
             "reward": float(step == 2), "advantage": 0.1 * s,
             "logprobs": [-0.5, -0.5, -0.5]}
            for s in range(2)]) for p in range(2)]
        store.record(step, groups, tokenizer=_Tok())
    tracer = SpanTracer(tmp_path)
    with tracer.span("rollout.generate", n=4):
        with tracer.span("rollout.judge"):
            pass
    with tracer.span("train.step"):
        pass
    return tmp_path


def test_overview_and_step_payloads(tmp_path):
    run = _fake_run(tmp_path)
    ov = payload.run_overview(run)
    assert [s["step"] for s in ov["steps"]] == [1, 2]
    assert ov["steps"][0]["n_samples"] == 4 and ov["steps"][0]["n_prompts"] == 2
    assert ov["steps"][1]["reward_mean"] == 1.0
    names = [r["name"] for r in ov["span_summary"]]
    assert set(names) == {"rollout.generate", "rollout.judge", "train.step"}
    assert ov["imbalance"] is not None and ov["imbalance"] > 0

    sp = payload.step_payload(run, 2)
    assert len(sp["groups"]) == 2
    s0 = sp["groups"][0]["samples"][0]
    assert s0["n_response_tokens"] == 3
    assert s0["response_text"].startswith("resp:")
    assert s0["mean_logprob"] == -0.5


def test_waterfall_nesting(tmp_path):
    run = _fake_run(tmp_path)
    wf = payload.span_waterfall(run)
    by_name = {s["name"]: s for s in wf["spans"]}
    assert by_name["rollout.generate"]["depth"] == 0
    assert by_name["rollout.judge"]["depth"] == 1  # nested under generate
    assert by_name["rollout.judge"]["phase"] == "rollout"
    assert wf["total_s"] >= by_name["rollout.generate"]["dur_s"]


def test_render_html_has_chart_and_tables(tmp_path):
    run = _fake_run(tmp_path)
    page = render.render_overview(payload.run_overview(run),
                                  payload.span_waterfall(run))
    assert "<svg" in page and "polyline" in page  # reward curve
    assert "rollout.judge" in page  # waterfall labels
    assert "prefers-color-scheme: dark" in page  # dark mode selected
    step_page = render.render_step(payload.step_payload(run, 1))
    assert "resp:" in step_page and "prompt 1" in step_page


def test_http_server_routes(tmp_path):
    run = _fake_run(tmp_path)
    srv = make_server(str(run), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        ov = json.loads(urllib.request.urlopen(f"{base}/api/overview").read())
        assert len(ov["steps"]) == 2
        html_page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "trace viewer" in html_page
        step = json.loads(urllib.request.urlopen(f"{base}/api/step/1").read())
        assert step["step"] == 1 and step["groups"]
        assert urllib.request.urlopen(f"{base}/step/1").status == 200
        spans = json.loads(urllib.request.urlopen(f"{base}/api/spans").read())
        assert spans["spans"]
    finally:
        srv.shutdown()
        t.join(timeout=5)
