"""`xtuner-tpu serve` surface: /v1/chat/completions on the RolloutWorker
(chat-template rendering + decoded messages) and the serve CLI arg plumbing.

Reference bar: deployment via `lmdeploy serve`/vLLM OpenAI servers (the
engines xtuner/v1/rl/rollout/worker.py:510 delegates to)."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.rl.worker import RolloutWorker
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def _post(url, path, payload):
    req = urllib.request.Request(url.rstrip("/") + path,
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def worker():
    cfg = DenseConfig(
        vocab_size=300, num_hidden_layers=2, hidden_size=32,
        intermediate_size=64, eos_token_id=258,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=128),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    w = RolloutWorker(cfg, params=params, tokenizer=UTF8ByteTokenizer(),
                      gen_cfg=GenerateConfig(max_new_tokens=8,
                                             eos_token_id=258),
                      compute_dtype=jnp.float32, chat_template="qwen")
    w.start()
    yield w
    w.stop()


def test_chat_completions(worker):
    out = _post(worker.base_url, "/v1/chat/completions",
                {"messages": [{"role": "system", "content": "be brief"},
                              {"role": "user", "content": "hi"}],
                 "max_tokens": 6, "temperature": 0.0})
    assert out["object"] == "chat.completion"
    assert len(out["choices"]) == 1
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)
    assert "token_ids" not in out["choices"][0]


def test_chat_completions_multi_turn_n2(worker):
    out = _post(worker.base_url, "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "a"},
                              {"role": "assistant", "content": "b"},
                              {"role": "user", "content": "c"}],
                 "n": 2, "max_tokens": 4, "temperature": 1.0})
    assert len(out["choices"]) == 2
    for ch in out["choices"]:
        assert ch["message"]["role"] == "assistant"


def test_chat_needs_template():
    cfg = DenseConfig(
        vocab_size=300, num_hidden_layers=1, hidden_size=32,
        intermediate_size=64, eos_token_id=258,
        attention=MHAConfig(num_attention_heads=2, num_key_value_heads=2,
                            head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=128),
    )
    params = init_params(cfg.build().param_specs(), jax.random.key(0))
    w = RolloutWorker(cfg, params=params, tokenizer=UTF8ByteTokenizer(),
                      compute_dtype=jnp.float32)  # no chat_template
    with pytest.raises(ValueError):
        w.chat_complete({"messages": [{"role": "user", "content": "x"}]})


def test_serve_cli_args_parse():
    # the CLI surface parses and registers; model loading needs a real
    # checkpoint so only the argparse contract is asserted here
    from xtuner_tpu.entry_point import MODES

    assert MODES["serve"] == "xtuner_tpu.train.cli.serve"
    import xtuner_tpu.train.cli.serve as serve_mod

    with pytest.raises(SystemExit):
        serve_mod.main(["--help"])


def test_concurrent_http_completions_share_engine(worker):
    """Two simultaneous HTTP completions ride the async paged engine —
    both finish, greedy results identical to a sequential run."""
    import threading

    payloads = [{"prompt_ids": [[10, 11, 12]], "max_tokens": 6,
                 "temperature": 0.0},
                {"prompt_ids": [[13, 14]], "max_tokens": 6,
                 "temperature": 0.0}]
    seq = [_post(worker.base_url, "/v1/completions", p)["choices"][0]
           for p in payloads]
    got = [None, None]

    def run(i):
        got[i] = _post(worker.base_url, "/v1/completions",
                       payloads[i])["choices"][0]

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    for i in range(2):
        assert got[i] is not None
        assert got[i]["token_ids"] == seq[i]["token_ids"]


def _sse_events(url, path, payload):
    req = urllib.request.Request(url.rstrip("/") + path,
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        raw = resp.read().decode()
    events = []
    for frame in raw.split("\n\n"):
        if not frame.startswith("data: "):
            continue
        body = frame[len("data: "):]
        if body == "[DONE]":
            events.append(None)
        else:
            events.append(json.loads(body))
    assert events[-1] is None  # [DONE] terminator
    return events[:-1]


def test_streaming_completions_matches_blocking(worker):
    payload = {"prompt_ids": [10, 11, 12], "max_tokens": 6,
               "temperature": 0.0}
    ref = _post(worker.base_url, "/v1/completions",
                payload)["choices"][0]
    events = _sse_events(worker.base_url, "/v1/completions",
                         {**payload, "stream": True})
    finish = events[-1]["choices"][0]
    assert finish["finish_reason"] in ("stop", "length")
    toks = [e["choices"][0]["token_id"] for e in events[:-1]]
    ref_toks = ref["token_ids"]
    if ref_toks and ref_toks[-1] == 258:  # stream never emits eos
        ref_toks = ref_toks[:-1]
    assert toks == ref_toks


def test_streaming_chat_deltas_concatenate(worker):
    msgs = [{"role": "user", "content": "hello"}]
    ref = _post(worker.base_url, "/v1/chat/completions",
                {"messages": msgs, "max_tokens": 6, "temperature": 0.0})
    events = _sse_events(worker.base_url, "/v1/chat/completions",
                         {"messages": msgs, "max_tokens": 6,
                          "temperature": 0.0, "stream": True})
    text = "".join(e["choices"][0].get("delta", {}).get("content", "")
                   for e in events)
    assert text == ref["choices"][0]["message"]["content"]


def test_streaming_rejects_multi_prompt(worker):
    import urllib.error

    req = urllib.request.Request(
        worker.base_url + "/v1/completions",
        data=json.dumps({"prompt_ids": [[1, 2], [3, 4]],
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 500


def test_logit_bias_forces_token(worker):
    # +100 bias on one token makes greedy decoding pick it every step
    out = _post(worker.base_url, "/v1/completions",
                {"prompt_ids": [5, 6, 7], "max_tokens": 4,
                 "temperature": 0.0, "logit_bias": {"42": 100.0}})
    assert out["choices"][0]["token_ids"] == [42, 42, 42, 42]


def test_stop_strings_halt_generation(worker):
    # force a repeating token via logit_bias, stop on its text
    tok = worker.tokenizer
    stop_txt = tok.decode([65])  # byte 'A' in the toy UTF8 tokenizer
    out = _post(worker.base_url, "/v1/completions",
                {"prompt_ids": [5, 6, 7], "max_tokens": 8,
                 "temperature": 0.0, "logit_bias": {"65": 100.0},
                 "stop": [stop_txt]})
    ch = out["choices"][0]
    assert ch["finish_reason"] == "stop"
    assert len(ch["token_ids"]) == 1  # halted at the first stop match
    assert ch["text"] == ""  # stop string truncated from the wire text


def test_sampling_param_change_reuses_engine(worker):
    """Different temperature/top_p/penalties must NOT build a new paged
    engine (per-request values ride as traced rows in one program — a
    remote recompile costs minutes on TPU)."""
    worker._paged_engines.clear()
    base = {"prompt_ids": [5, 6, 7], "max_tokens": 4}
    _post(worker.base_url, "/v1/completions", {**base, "temperature": 0.7})
    _post(worker.base_url, "/v1/completions", {**base, "temperature": 1.3})
    _post(worker.base_url, "/v1/completions",
          {**base, "temperature": 0.9, "repetition_penalty": 1.2,
           "presence_penalty": 0.5})
    # temp changes share one engine; penalties flip a class bit -> second
    assert len(worker._paged_engines) == 2


def test_metrics_endpoint(worker):
    _post(worker.base_url, "/v1/completions",
          {"prompt_ids": [1, 2, 3], "max_tokens": 3, "temperature": 0.0})
    with urllib.request.urlopen(worker.base_url + "/metrics",
                                timeout=30) as r:
        text = r.read().decode()
    assert "xtuner_requests" in text
    assert "xtuner_generated_tokens" in text
    assert 'xtuner_engine_slots_total{engine="0"}' in text


def test_rollout_client_chat_and_stream(worker):
    from xtuner_tpu.rl.rollout_client import (RolloutClient,
                                              RolloutClientConfig)

    client = RolloutClient(RolloutClientConfig(base_url=worker.base_url))
    msgs = [{"role": "user", "content": "hey"}]
    out = client.chat(msgs, max_tokens=4, temperature=0.0)
    assert out[0]["message"]["role"] == "assistant"

    events = list(client.stream(messages=msgs, max_tokens=4,
                                temperature=0.0))
    text = "".join(e.get("delta", {}).get("content", "") for e in events)
    assert text == out[0]["message"]["content"]
