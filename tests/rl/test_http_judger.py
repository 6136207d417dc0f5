"""HTTP LLM judger against a local stub verifier (reference
compass_verifier_v2.py — zero-egress friendly: any in-cluster endpoint)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from xtuner_tpu.rl.judger import HTTPJudger


def _stub_server(reply_fn):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            text = reply_fn(req["messages"][0]["content"])
            body = json.dumps({"choices": [{"message": {"content": text}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_judger_verdicts():
    srv, url = _stub_server(lambda prompt: "A" if "gold42" in prompt else "B")
    try:
        j = HTTPJudger([url])
        assert j.judge("the answer is right", "gold42") == 1.0
        assert j.judge("the answer is wrong", "other") == 0.0
    finally:
        srv.shutdown()


def test_http_judger_cleans_thinking():
    seen = {}

    def reply(prompt):
        seen["prompt"] = prompt
        return "A"

    srv, url = _stub_server(reply)
    try:
        j = HTTPJudger([url])
        j.judge("secret chain of thought</think>final answer", "x")
        assert "chain of thought" not in seen["prompt"]
        assert "final answer" in seen["prompt"]
    finally:
        srv.shutdown()


def test_http_judger_unreachable_neutral_default():
    # outages must NOT punish samples by default; -1 sentinel is opt-in
    j = HTTPJudger(["http://127.0.0.1:9"], max_retries=2, timeout=0.5)
    assert j.judge("anything", "x") == 0.0
    j2 = HTTPJudger(["http://127.0.0.1:9"], max_retries=2, timeout=0.5,
                    unjudgeable_score=-1.0)
    assert j2.judge("anything", "x") == -1.0
