"""HTTP-level serving benchmark against the in-process RolloutWorker.

Closed-loop concurrency: SRV_CONC client threads each fire SRV_REQS
sequential /v1/completions requests (SRV_PROMPT prompt tokens, SRV_NEW
generated tokens) at the paged async engine, so concurrent requests share
the continuous-batching decode. Reports aggregate generated-token
throughput, request latency percentiles, and streaming TTFT.

Multi-turn mode (SRV_TURNS>1): each client runs a CONVERSATION — every
turn's prompt is the previous prompt + generated tokens + a fresh user
suffix — so per-turn prefill grows linearly. With automatic prefix caching
(default) the cached turns are restored instead of recomputed; SRV_APC=0
measures the same workload without it.

Usage (TPU backend for real numbers; CPU works for smoke):
    python tools/bench_serving.py
    SRV_CONC=16 SRV_REQS=4 SRV_NEW=128 python tools/bench_serving.py
    SRV_KV_DTYPE=int8 SRV_STREAM=1 python tools/bench_serving.py
    SRV_TURNS=6 SRV_APC=0 python tools/bench_serving.py   # APC ablation

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.params import init_params
    from xtuner_tpu.rl.rollout_client import RolloutClient, RolloutClientConfig
    from xtuner_tpu.rl.worker import RolloutWorker

    conc = int(os.environ.get("SRV_CONC", 16))
    reqs = int(os.environ.get("SRV_REQS", 4))
    p_len = int(os.environ.get("SRV_PROMPT", 512))
    n_new = int(os.environ.get("SRV_NEW", 128))
    layers = int(os.environ.get("SRV_LAYERS", 12))
    kv_dtype = os.environ.get("SRV_KV_DTYPE", "bf16")
    stream = os.environ.get("SRV_STREAM", "0") == "1"
    turns = int(os.environ.get("SRV_TURNS", 1))
    apc = os.environ.get("SRV_APC", "1") == "1"

    cfg = DenseConfig(
        vocab_size=32768, num_hidden_layers=layers, hidden_size=1024,
        intermediate_size=4096, eos_token_id=2,
        attention=MHAConfig(num_attention_heads=8, num_key_value_heads=2,
                            head_dim=128),
        lm_loss_cfg=CELossConfig(chunk_size=2048),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    # multi-turn conversations grow: size the pool for the final turn
    max_len = (p_len + (n_new + 32) * turns + 256)
    g = GenerateConfig(max_new_tokens=n_new, temperature=1.0, top_p=0.95,
                       eos_token_id=2, max_length=max_len,
                       paged_max_batch=conc,
                       paged_block_size=int(os.environ.get("SRV_BLOCK", 128)),
                       kv_cache_dtype=kv_dtype, prefix_cache=apc,
                       prefill_chunk=int(os.environ.get("SRV_CHUNK", 0)))
    w = RolloutWorker(cfg, params=params, gen_cfg=g,
                      compute_dtype=jnp.bfloat16)
    w.start()
    rng = np.random.default_rng(0)

    def _prompt():
        return rng.integers(10, 30000, (p_len,)).tolist()

    # warmup: compile prefill bucket + decode program
    client = RolloutClient(RolloutClientConfig(base_url=w.base_url,
                                               timeout=3600))
    client._post("/v1/completions", {"prompt_ids": _prompt(),
                                     "max_tokens": 4})

    lat: list[float] = []
    ttft: list[float] = []
    tokens = [0]
    lock = threading.Lock()

    def run_convo(c):
        """One multi-turn conversation; returns per-turn latencies."""
        convo = _prompt()
        lats = []
        for t in range(turns):
            t0 = time.time()
            out = c._post("/v1/completions",
                          {"prompt_ids": convo, "max_tokens": n_new})
            lats.append(time.time() - t0)
            ch = out["choices"][0]
            convo = convo + ch["token_ids"] + rng.integers(
                10, 30000, (32,)).tolist()  # next user turn
            with lock:
                tokens[0] += len(ch["token_ids"])
        return lats

    def run_client():
        c = RolloutClient(RolloutClientConfig(base_url=w.base_url,
                                              timeout=3600))
        if turns > 1:
            for _ in range(reqs):
                ls = run_convo(c)
                with lock:
                    lat.extend(ls)
            return
        for _ in range(reqs):
            t0 = time.time()
            if stream:
                first = None
                n_tok = 0
                # stream via raw post (prompt_ids native)
                import urllib.request
                req = urllib.request.Request(
                    w.base_url + "/v1/completions",
                    data=json.dumps({"prompt_ids": _prompt(),
                                     "max_tokens": n_new,
                                     "stream": True}).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=3600) as resp:
                    buf = b""
                    while True:
                        ch = resp.read(1)
                        if not ch:
                            break
                        buf += ch
                        while b"\n\n" in buf:
                            frame, buf = buf.split(b"\n\n", 1)
                            if frame.startswith(b"data: ") and \
                                    frame != b"data: [DONE]":
                                if first is None:
                                    first = time.time() - t0
                                n_tok += 1
            else:
                out = c._post("/v1/completions",
                              {"prompt_ids": _prompt(),
                               "max_tokens": n_new})
                n_tok = len(out["choices"][0]["token_ids"])
                first = None
            dt = time.time() - t0
            with lock:
                lat.append(dt)
                tokens[0] += n_tok
                if first is not None:
                    ttft.append(first)

    t_start = time.time()
    threads = [threading.Thread(target=run_client) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start
    apc_stats = {"apc_hits": 0, "apc_cached_tokens": 0, "apc_lookups": 0}
    for eng in w._paged_engines.values():
        pc = eng.pg.prefix_cache
        if pc is not None:
            apc_stats["apc_hits"] += pc.hits
            apc_stats["apc_cached_tokens"] += pc.cached_tokens
            apc_stats["apc_lookups"] += pc.lookups
    w.stop()

    lat_s = sorted(lat)

    def pct(p):
        return round(lat_s[min(int(len(lat_s) * p), len(lat_s) - 1)], 3)

    out = {
        "serving_tok_s": round(tokens[0] / wall, 1),
        "requests": len(lat), "concurrency": conc,
        "wall_s": round(wall, 2),
        "latency_p50_s": pct(0.50), "latency_p90_s": pct(0.90),
        "latency_p99_s": pct(0.99),
        "prompt_len": p_len, "max_new": n_new, "kv_dtype": kv_dtype,
        "stream": stream,
    }
    if turns > 1:
        out["turns"] = turns
        out["prefix_cache"] = apc
        out.update(apc_stats)
    if ttft:
        tt = sorted(ttft)
        out["ttft_p50_s"] = round(tt[len(tt) // 2], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
