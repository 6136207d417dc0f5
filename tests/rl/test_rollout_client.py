"""RolloutClient against a local fake OpenAI-compatible server (the reference
FastAPI fake-judger/server test pattern, SURVEY.md §4.6)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from xtuner_tpu.rl.rollout_client import RolloutClient, RolloutClientConfig


class FakeServer(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        n = body.get("n", 1)
        resp = {"choices": [
            {"text": f"fake response {i} to: {body['prompt'][:20]}",
             "finish_reason": "stop",
             "logprobs": {"token_logprobs": [-0.5, -1.0], "tokens": ["fake", "resp"]}}
            for i in range(n)
        ]}
        data = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture
def server():
    httpd = HTTPServer(("127.0.0.1", 0), FakeServer)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_generate_n_with_logprobs(server):
    client = RolloutClient(RolloutClientConfig(base_url=server))
    out = client.generate("what is 2+2?", n=3, max_tokens=8)
    assert len(out) == 3
    assert out[0]["text"].startswith("fake response 0")
    assert out[0]["logprobs"] == [-0.5, -1.0]
    assert client.health()


def test_pause_blocks(server):
    client = RolloutClient(RolloutClientConfig(base_url=server))
    client.pause()
    with pytest.raises(RuntimeError):
        client.generate("x")
    client.resume()
    assert client.generate("x")


def test_unreachable_raises():
    client = RolloutClient(RolloutClientConfig(base_url="http://127.0.0.1:1",
                                               max_retries=1, retry_backoff=0.0, timeout=0.3))
    with pytest.raises(RuntimeError):
        client.generate("x")
