"""Worker-level automatic prefix caching: multi-turn chats through the HTTP
surface reuse the previous turn's KV (the serving win vLLM/SGLang give the
reference's rollout workers), /metrics exposes the counters, and a weight
update invalidates the retained KV."""

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


def _get(url, path):
    with urllib.request.urlopen(url.rstrip("/") + path, timeout=60) as resp:
        return resp.read().decode()


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
                                             eos_token_id=258,
                                             paged_block_size=16),
                      compute_dtype=jnp.float32, chat_template="qwen")
    w.start()
    yield w
    w.stop()


def _pcs(worker):
    return [eng.pg.prefix_cache for eng in worker._paged_engines.values()
            if eng.pg.prefix_cache is not None]


def test_multi_turn_chat_reuses_kv(worker):
    convo = [{"role": "user", "content": "tell me something long enough"}]
    out = _post(worker.base_url, "/v1/chat/completions",
                {"messages": convo, "max_tokens": 8, "temperature": 0.0})
    convo.append(out["choices"][0]["message"])
    convo.append({"role": "user", "content": "go on"})
    _post(worker.base_url, "/v1/chat/completions",
          {"messages": convo, "max_tokens": 8, "temperature": 0.0})
    pcs = _pcs(worker)
    assert pcs, "paged engine should run with a prefix cache"
    assert sum(pc.hits for pc in pcs) >= 1
    assert sum(pc.cached_tokens for pc in pcs) >= 16  # >= one block reused

    metrics = _get(worker.base_url, "/metrics")
    assert "xtuner_prefix_cache_hits" in metrics
    assert "xtuner_prefix_cache_cached_tokens" in metrics


def test_update_weights_flushes(worker):
    _post(worker.base_url, "/v1/completions",
          {"prompt": "a repeated prompt for the cache", "max_tokens": 4,
           "temperature": 0.0})
    assert any(len(pc) > 0 for pc in _pcs(worker))
    # colocate-style version ack invalidates retained KV
    worker.store.set(worker.store.get()[0], (worker.store.version or 0) + 1)
    _post(worker.base_url, "/update_weights",
          {"version": worker.store.version})
    # flush is applied on the engine thread at the next tick
    _post(worker.base_url, "/v1/completions",
          {"prompt": "something fresh after the update", "max_tokens": 4,
           "temperature": 0.0})
    for eng in worker._paged_engines.values():
        assert not eng.pg._flush_requested  # drained
