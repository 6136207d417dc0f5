"""Benchmark: SFT training throughput on the available chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference XTuner V1 BF16 FSDP = 2,000 tokens/GPU/s (Hopper, 64k seq,
docs/en/pretrain_sft/advanced_tutorial/float8.md:14-17; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.datasets.collator import fake_collator
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.parallel.mesh import MeshConfig

    n_dev = len(jax.devices())
    # ~0.6B dense (qwen3-0.6b geometry) — fits one v5e chip with fp32 masters
    cfg = DenseConfig(
        vocab_size=151936,
        num_hidden_layers=28,
        hidden_size=1024,
        intermediate_size=3072,
        tie_word_embeddings=True,
        rope_theta=1000000.0,
        attention=MHAConfig(num_attention_heads=16, num_key_value_heads=8, head_dim=128,
                            qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=2048),
    )
    seq_len = 8192
    mesh_cfg = MeshConfig(fsdp_size=n_dev)
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-5), LRConfig(warmup_steps=2), mesh_cfg,
                         total_steps=100)
    engine.init_random(0)

    rows = n_dev
    flat = fake_collator(rows, seq_len, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, rows, seq_len) for k, v in flat.items()}
    tokens_per_step = rows * seq_len

    # warmup (compile)
    for step in range(1, 3):
        m = engine.train_step(batch, step)
        float(m["total_loss"])  # force full sync

    n_steps = 8
    times = []
    for step in range(3, 3 + n_steps):
        t0 = time.time()
        m = engine.train_step(batch, step)
        float(m["total_loss"])  # sync each step
        times.append(time.time() - t0)
    dt = float(np.median(times))

    tokens_per_sec_chip = tokens_per_step / dt / n_dev
    n_params = engine.num_params
    # 6*P per token (fwd+bwd) + attention flops; remat adds ~fwd again (x8 total)
    flops_per_token = 6 * n_params + 12 * cfg.num_hidden_layers * cfg.hidden_size * seq_len // 2
    mfu = flops_per_token * tokens_per_sec_chip / 197e12  # v5e bf16 peak/chip
    baseline = 2000.0  # reference BF16 tokens/GPU/s (H100-class; see BASELINE.md)
    print(json.dumps({
        "metric": "dense0.6b_sft_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec_chip, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_sec_chip / baseline, 3),
        "mfu": round(mfu, 4),
        "step_time_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
