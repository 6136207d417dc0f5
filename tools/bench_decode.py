"""Decode-throughput bench for the paged rollout engine (real TPU).

Measures the jitted decode step of `model/paged_generate.PagedGenerator` at a
serving-class shape, WITHOUT the host driver: steps are chained on-device
(tok/lens/pools fed back as device arrays, no per-step readback), so the axon
tunnel's enqueue-ack latency cancels out. Per-step time comes from the
difference between a long and a short chain (marginal cost), not absolutes.

Usage (TPU backend):
    python tools/bench_decode.py                 # default 250M dense shape
    DEC_BATCH=16 DEC_CTX=2048 python tools/bench_decode.py

Prints one JSON line: {"decode_tok_s": ..., "step_ms": ..., ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch: int, ctx: int, layers: int, kv_heads: int,
          block_size: int = 128, kv_dtype: str = "bf16"):
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.model.paged_generate import PagedGenerator
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.params import init_params

    cfg = DenseConfig(
        vocab_size=32768, num_hidden_layers=layers, hidden_size=1024,
        intermediate_size=4096, eos_token_id=2,
        attention=MHAConfig(num_attention_heads=8, num_key_value_heads=kv_heads,
                            head_dim=128),
        lm_loss_cfg=CELossConfig(chunk_size=2048),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    g = GenerateConfig(max_new_tokens=64, do_sample=False, temperature=0.0,
                       eos_token_id=2, max_length=ctx + 128,
                       paged_max_batch=batch, paged_block_size=block_size,
                       kv_cache_dtype=kv_dtype)
    pg = PagedGenerator(model, params, g, max_batch=batch,
                        block_size=block_size,
                        compute_dtype=jnp.bfloat16, pad_token_id=0)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    return cfg, model, params, pg, n_params


def chain_steps(pg, batch: int, ctx: int, n_steps: int):
    """Enqueue n_steps chained decode steps; return final tok (device)."""
    step = pg._decode()
    # context pre-staged: pretend every slot holds `ctx` cached tokens and
    # enough blocks for the chain
    for i in range(batch):
        pg.cache.add_sequence(1000 + i, ctx)
        pg.cache.extend(1000 + i, n_steps + 2)
    table = np.zeros((batch, pg.max_blocks), np.int32)
    for i in range(batch):
        ids = pg.cache.tables[1000 + i]
        table[i, :len(ids)] = ids
    tok = jnp.ones((batch,), jnp.int32)
    lens = jnp.full((batch,), ctx, jnp.int32)
    table_d = jnp.asarray(table)
    active = jnp.ones((batch,), bool)
    pool_k, pool_v = pg.cache.pool_k, pg.cache.pool_v
    rng = jax.random.key(1)
    # greedy bench: empty penalty state, per-row params from gen_cfg defaults
    from xtuner_tpu.model.paged_generate import _row_params

    seen = jnp.zeros((batch, 0), bool)
    counts = jnp.zeros((batch, 0), jnp.int32)
    n_gen = jnp.zeros((batch,), jnp.int32)
    row = {k: jnp.asarray(v) for k, v in _row_params(pg.gen_cfg, None, batch).items()}
    for _ in range(n_steps):
        rng, r = jax.random.split(rng)
        (tok, lp, lens, pool_k, pool_v, _, _, seen, counts, _, _) = step(
            pg.params, pool_k, pool_v, {}, tok, lens, table_d, active, r,
            seen, counts, n_gen, row)
    # restore cache arrays so a second chain can rebuild bookkeeping
    for i in range(batch):
        pg.cache.release(1000 + i)
    pg.cache.pool_k, pg.cache.pool_v = pool_k, pool_v
    return tok


def main():
    batch = int(os.environ.get("DEC_BATCH", 8))
    ctx = int(os.environ.get("DEC_CTX", 1024))
    layers = int(os.environ.get("DEC_LAYERS", 12))
    kv_heads = int(os.environ.get("DEC_KV", 2))
    block_size = int(os.environ.get("DEC_BLOCK", 128))
    kv_dtype = os.environ.get("DEC_KV_DTYPE", "bf16")
    n_short, n_long = 8, 72
    cfg, model, params, pg, n_params = build(batch, ctx, layers, kv_heads,
                                             block_size, kv_dtype)

    # warmup / compile
    np.asarray(chain_steps(pg, batch, ctx, 2))

    t0 = time.perf_counter()
    np.asarray(chain_steps(pg, batch, ctx, n_short))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain_steps(pg, batch, ctx, n_long))
    t_long = time.perf_counter() - t0
    step_s = (t_long - t_short) / (n_long - n_short)
    tok_s = batch / step_s

    # HBM traffic floor: params once + KV window per step
    attn = cfg.attention
    kv_item = 1 if kv_dtype == "int8" else 2  # int8 rows: D+4 bytes
    kv_dim = attn.head_dim + (4 if kv_dtype == "int8" else 0)
    kv_bytes = (2 * layers * batch * ctx * kv_heads * kv_dim * kv_item)
    out = {
        "decode_tok_s": round(tok_s, 1),
        "step_ms": round(step_s * 1e3, 3),
        "batch": batch, "ctx": ctx, "layers": layers, "block": block_size,
        "kv_dtype": kv_dtype,
        "params_m": round(n_params / 1e6, 1),
        "param_bytes_gb": round(n_params * 2 / 1e9, 3),
        "kv_read_mb_per_step": round(kv_bytes / 1e6, 1),
        "hbm_floor_ms": round((n_params * 2 + kv_bytes) / 819e9 * 1e3, 3),
        "bw_util": round((n_params * 2 + kv_bytes) / 819e9 / step_s, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
