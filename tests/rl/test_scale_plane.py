"""RL scale plane: rollout worker HTTP surface, weight transports, async
producer, partial rollouts, health manager, session server, trace store,
and the disaggregated trainer end-to-end."""

import json
import time
import urllib.request

import jax
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.rl.health_manager import HealthManager, WorkerRegistry
from xtuner_tpu.rl.producer import AsyncProducer, PartialRollout, chunked_rollout
from xtuner_tpu.rl.replay_buffer import ReplayBuffer, SampleGroup
from xtuner_tpu.rl.session_server import SessionServer
from xtuner_tpu.rl.trace import RolloutTraceStore
from xtuner_tpu.rl.transport import ColocateTransport, FilesystemTransport, ParamStore
from xtuner_tpu.rl.worker import RolloutWorker
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def tiny_model():
    cfg = DenseConfig(
        vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        eos_token_id=258,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=128),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    return cfg, params


def _post(url, path, payload):
    req = urllib.request.Request(url.rstrip("/") + path,
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def worker():
    cfg, params = tiny_model()
    w = RolloutWorker(cfg, params=params, tokenizer=UTF8ByteTokenizer(),
                      gen_cfg=GenerateConfig(max_new_tokens=8, eos_token_id=258),
                      compute_dtype=jax.numpy.float32)
    w.start()
    yield w
    w.stop()


def test_worker_health_and_completion(worker):
    with urllib.request.urlopen(worker.base_url + "/health", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"

    out = _post(worker.base_url, "/v1/completions",
                {"prompt_ids": [[10, 11, 12], [13, 14]], "n": 2, "max_tokens": 6,
                 "logprobs": True})
    assert len(out["choices"]) == 4  # 2 prompts x n=2
    c0 = out["choices"][0]
    assert 1 <= len(c0["token_ids"]) <= 6
    assert len(c0["logprobs"]["token_logprobs"]) == len(c0["token_ids"])
    assert "text" in c0 and "policy_version" in out


def test_worker_pause_gate(worker):
    _post(worker.base_url, "/pause", {})
    try:
        req = urllib.request.Request(
            worker.base_url + "/v1/completions",
            data=json.dumps({"prompt_ids": [[1, 2]], "max_tokens": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 409
    finally:
        _post(worker.base_url, "/resume", {})


def test_filesystem_transport_roundtrip(tmp_path):
    cfg, params = tiny_model()
    t = FilesystemTransport(tmp_path / "ws", keep=2)
    t.publish(params, 1)
    bumped = jax.tree.map(lambda x: x + 1.0, params)
    t.publish(bumped, 2)
    assert t.latest_version() == 2
    fetched, ver = t.fetch(jax.tree.structure(params))
    assert ver == 2
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(fetched)[0]),
                               np.asarray(jax.tree.leaves(bumped)[0]))
    t.publish(bumped, 3)
    # gc keeps only `keep` snapshots
    assert len(list((tmp_path / "ws").glob("weights-*.npz"))) == 2


def test_shm_transport_roundtrip(tmp_path):
    """SharedMemoryTransport (the CUDA-IPC analog): raw-segment publish +
    zero-copy mmap fetch must round-trip mixed dtypes incl. bfloat16."""
    import jax.numpy as jnp

    from xtuner_tpu.rl.transport import SharedMemoryTransport

    cfg, params = tiny_model()
    params = dict(params, extra_bf16=jnp.arange(24, dtype=jnp.bfloat16).reshape(4, 6))
    t = SharedMemoryTransport(tmp_path / "shm", keep=2)
    t.publish(params, 1)
    bumped = jax.tree.map(lambda x: x + 1.0, params)
    t.publish(bumped, 2)
    assert t.latest_version() == 2
    fetched, ver = t.fetch(jax.tree.structure(params))
    assert ver == 2
    for a, b in zip(jax.tree.leaves(fetched), jax.tree.leaves(bumped)):
        assert a.dtype == np.asarray(b).dtype
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32))
    t.publish(bumped, 3)
    assert len(list((tmp_path / "shm").glob("weights-*.bin"))) == 2
    assert len(list((tmp_path / "shm").glob("weights-*.json"))) == 2


def test_worker_update_weights_filesystem(tmp_path):
    cfg, params = tiny_model()
    w = RolloutWorker(cfg, params=params, compute_dtype=jax.numpy.float32)
    t = FilesystemTransport(tmp_path / "ws2")
    t.publish(jax.tree.map(lambda x: x * 0.5, params), 7)
    ver = w.update_weights(path=str(tmp_path / "ws2"))
    assert ver == 7 and w.store.version == 7


def test_worker_update_weights_shm(tmp_path):
    """update_weights sniffs the transport kind from the marker (.bin = shm)."""
    from xtuner_tpu.rl.transport import SharedMemoryTransport

    cfg, params = tiny_model()
    w = RolloutWorker(cfg, params=params, compute_dtype=jax.numpy.float32)
    t = SharedMemoryTransport(tmp_path / "ws3")
    t.publish(jax.tree.map(lambda x: x * 0.25, params), 9)
    ver = w.update_weights(path=str(tmp_path / "ws3"))
    assert ver == 9 and w.store.version == 9
    got, _ = w.store.get()
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got)[0], np.float32),
        np.asarray(jax.tree.leaves(params)[0], np.float32) * 0.25, rtol=1e-6)


def test_async_producer_and_staleness():
    buf = ReplayBuffer(max_staleness=1)
    calls = []

    def produce(version):
        calls.append(version)
        time.sleep(0.02)
        return [SampleGroup(prompt_id=len(calls), samples=[{"x": 1}],
                            policy_version=version)]

    p = AsyncProducer(produce, buf, start_version=0)
    p.start()
    got = p.get_batch(2, current_step=0, timeout=30)
    assert len(got) == 2 and all(g.policy_version == 0 for g in got)
    p.pause()
    n_after_pause = len(calls)
    time.sleep(0.1)
    assert len(calls) <= n_after_pause + 1  # gate actually closed
    p.resume(5)
    got = p.get_batch(1, current_step=5, timeout=30)
    # staleness filter: only version-5 groups survive current_step=5 w/ max_staleness=1
    assert got[0].policy_version >= 4
    p.stop()


def test_async_producer_error_propagates():
    buf = ReplayBuffer()

    def produce(version):
        raise RuntimeError("rollout engine crashed")

    p = AsyncProducer(produce, buf)
    p.start()
    with pytest.raises(RuntimeError, match="producer failed"):
        p.get_batch(1, current_step=0, timeout=10)
    p.stop()


def test_chunked_partial_rollout(worker):
    """Weight-version bump between chunks is visible in per-chunk tags."""
    versions = {"v": 0}

    def client_generate(prompt_ids, max_tokens):
        out = _post(worker.base_url, "/v1/completions",
                    {"prompt_ids": prompt_ids, "max_tokens": max_tokens,
                     "logprobs": True})
        out["policy_version"] = versions["v"]  # simulate the serving version
        return out

    pause_after_first = {"flag": False}

    def should_pause():
        return pause_after_first["flag"]

    pr = chunked_rollout(client_generate, [5, 6, 7], max_new_tokens=8,
                         chunk_size=3, eos_token_id=258,
                         should_pause=should_pause)
    assert pr.response_ids and len(pr.logprobs) == len(pr.response_ids)

    # now interrupt after the first chunk and resume under a new version
    pr2 = PartialRollout(prompt_ids=[5, 6, 7])
    pause_after_first["flag"] = True
    pr2 = chunked_rollout(client_generate, [5, 6, 7], max_new_tokens=9,
                          chunk_size=3, eos_token_id=258,
                          should_pause=should_pause, partial=pr2)
    if not pr2.finished:
        versions["v"] = 1
        pause_after_first["flag"] = False
        pr2 = chunked_rollout(client_generate, [5, 6, 7], max_new_tokens=9,
                              chunk_size=3, eos_token_id=258,
                              should_pause=should_pause, partial=pr2)
        assert 0 in pr2.versions and (1 in pr2.versions or pr2.finished)


def test_health_manager_marks_dead(worker):
    registry = WorkerRegistry()
    registry.register(worker.base_url)
    registry.register("http://127.0.0.1:9")  # nothing listens on port 9
    hm = HealthManager(registry, interval=999, failure_threshold=2, timeout=1)
    hm.check_once()
    hm.check_once()
    states = {w.url: w for w in registry.states()}
    assert states[worker.base_url].alive
    assert not states["http://127.0.0.1:9"].alive
    assert registry.route().url == worker.base_url


def test_session_server_multi_turn(worker):
    tok = UTF8ByteTokenizer()
    s = SessionServer(worker.base_url, tok, chat_template="qwen",
                      eos_token_id=258)
    sid = s.create(system="be brief")
    s.append(sid, "user", "hi")
    out1 = s.generate(sid, max_tokens=4)
    assert isinstance(out1["text"], str)
    s.append(sid, "user", "again")
    out2 = s.generate(sid, max_tokens=4)
    hist = s.history(sid)
    roles = [m["role"] for m in hist]
    assert roles == ["system", "user", "assistant", "user", "assistant"]
    sess = s.close(sid)
    assert len(sess.versions) == 2
    with pytest.raises(KeyError):
        s.history(sid)


def test_trace_store_roundtrip(tmp_path):
    store = RolloutTraceStore(tmp_path)
    g = SampleGroup(prompt_id=3, policy_version=2, samples=[{
        "prompt_ids": [1, 2], "response_ids": [3, 4], "logprobs": [-0.1, -0.2],
        "reward": 1.0, "advantage": 0.5,
    }])
    store.record(1, [g], tokenizer=UTF8ByteTokenizer())
    store.record(2, [g])
    assert store.steps() == [1, 2]
    recs = store.load_step(1)
    assert recs[0]["prompt_id"] == 3 and recs[0]["response_ids"] == [3, 4]
    assert "response_text" in recs[0]
    assert len(list(store.iter_traces())) == 2


@pytest.mark.slow
def test_disagg_trainer_end_to_end(tmp_path):
    from xtuner_tpu.config.optim import AdamWConfig
    from xtuner_tpu.parallel.mesh import MeshConfig
    from xtuner_tpu.rl.disagg_trainer import (RLDisaggregatedTrainer,
                                              RLDisaggregatedTrainerConfig)
    from xtuner_tpu.rl.grpo_loss import GRPOLossConfig

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"What is {i} plus {i}?",
                                "label": f"#### {2 * i}"}) + "\n")
    cfg = RLDisaggregatedTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            eos_token_id=258,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        prompts_path=str(prompts),
        optim_cfg=AdamWConfig(lr=1e-4),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        loss_cfg=GRPOLossConfig(cliprange_low=0.2, cliprange_high=0.2),
        gen_cfg=GenerateConfig(max_new_tokens=8, temperature=1.0, eos_token_id=258),
        group_size=4, prompts_per_step=2, total_steps=2, max_prompt_length=56,
        work_dir=str(tmp_path / "work"), exp_name="rl_disagg",
        transport="filesystem",
    )
    trainer = RLDisaggregatedTrainer(cfg)
    trainer.fit()
    # traces recorded for both steps, weight sync advanced the worker version
    assert trainer.trace_store.steps() == [1, 2]
    assert trainer.worker.store.version == 2
    tracker = trainer.work_dir / "tracker.jsonl"
    lines = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(lines) >= 2 and "staleness" in lines[-1]


def test_session_http_openai_and_anthropic(worker):
    """The HTTP facade speaks both wire formats with stateful sessions
    (reference session_server.py:26-153 format adaptation)."""
    from xtuner_tpu.rl.session_server import SessionHTTPServer

    tok = UTF8ByteTokenizer()
    sessions = SessionServer(worker.base_url, tok, chat_template="qwen",
                             eos_token_id=258)
    srv = SessionHTTPServer(sessions).start()
    try:
        # openai format, session continued across calls
        r1 = _post(srv.url, "/v1/chat/completions", {
            "model": "m", "max_tokens": 4,
            "messages": [{"role": "system", "content": "be brief"},
                         {"role": "user", "content": "hi"}]})
        assert r1["object"] == "chat.completion"
        assert r1["choices"][0]["message"]["role"] == "assistant"
        sid = r1["session_id"]
        r2 = _post(srv.url, "/v1/chat/completions", {
            "model": "m", "max_tokens": 4, "session_id": sid,
            "messages": [{"role": "user", "content": "again"}]})
        assert r2["session_id"] == sid
        assert [m["role"] for m in sessions.history(sid)] == [
            "system", "user", "assistant", "user", "assistant"]

        # anthropic format with block content
        r3 = _post(srv.url, "/v1/messages", {
            "model": "m", "max_tokens": 4, "system": "short",
            "messages": [{"role": "user",
                          "content": [{"type": "text", "text": "yo"}]}]})
        assert r3["type"] == "message" and r3["role"] == "assistant"
        assert r3["content"][0]["type"] == "text"
        assert r3["stop_reason"] in ("end_turn", "max_tokens")

        # malformed request -> structured 400, server keeps serving
        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            _post(srv.url, "/v1/chat/completions", {"messages": "nope"})
        _post(srv.url, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "ok"}], "max_tokens": 2})
    finally:
        srv.stop()
