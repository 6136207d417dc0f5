"""Benchmark: dropless-MoE SFT training throughput at 64k sequence length
(the reference's headline workload shape — BASELINE.md: XTuner V1 BF16 FSDP =
2,000 tokens/GPU/s at seq 64k on Hopper).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The model is a Qwen3-MoE-family config scaled to the available chip count
(per-chip memory), keeping the structural shape: 128-ish experts -> 32,
top-k routing, grouped expert GEMMs, packed 64k rows, chunked CE.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.datasets.collator import fake_collator
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.moe import MoEConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.router import GreedyRouterConfig
    from xtuner_tpu.parallel.mesh import MeshConfig

    n_dev = len(jax.devices())
    seq_len = int(os.environ.get("BENCH_SEQ", 65536))
    # Round-3 default shape: 10 layers / 64 experts / top-4 (the same 1/16
    # expert-sparsity ratio as Qwen3-30B-A3B's 8-of-128), 470.8M params —
    # the biggest Qwen3-MoE-structured model whose full fp32 AdamW state
    # (master+m+v+grads = 16 B/param) PLUS 64k-seq saved residuals
    # (~384 MB/layer under save_out_lse) fits a single 16 GB v5e. The
    # reference's 30B-A3 shards this state over >=64 GPUs; one chip holding
    # everything caps out here (measured: 533M/10L OOMs by 0.2 GB,
    # 596M/10L by 0.9 GB, 685M/12L by 1.5 GB — see docs/kernels.md).
    cfg = MoEConfig(
        vocab_size=151936,
        num_hidden_layers=int(os.environ.get("BENCH_LAYERS", 10)),
        hidden_size=int(os.environ.get("BENCH_HIDDEN", 1024)),
        intermediate_size=3072,
        moe_intermediate_size=int(os.environ.get("BENCH_MOE_INTER", 128)),
        n_routed_experts=int(os.environ.get("BENCH_EXPERTS", 64)),
        num_experts_per_tok=int(os.environ.get("BENCH_TOPK", 4)),
        tie_word_embeddings=True,
        rope_theta=1000000.0,
        balancing_loss_coef=0.001,
        router=GreedyRouterConfig(),
        attention=MHAConfig(num_attention_heads=16, num_key_value_heads=8, head_dim=128,
                            qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=2048, mode="fused"),
    )
    if os.environ.get("BENCH_FP8"):  # tile-wise fp8 expert + attention GEMMs
        from xtuner_tpu.ops.float8 import Float8Config

        cfg = cfg.model_copy(update={"float8_cfg": Float8Config(
            e5m2_grads=os.environ.get("BENCH_FP8") == "e5m2")})
    # 64k: the full (q,k,v,out,lse) residual set OOMs 16GB, but (out,lse)
    # alone fits — backward recomputes projections, never the fwd flash kernel
    remat = os.environ.get(
        "BENCH_REMAT",
        "save_attn_residuals" if seq_len <= 16384 else "save_out_lse")
    mesh_cfg = MeshConfig(fsdp_size=n_dev, remat_policy=remat)
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-5), LRConfig(warmup_steps=2), mesh_cfg,
                         total_steps=100)
    engine.init_random(0)

    rows = n_dev
    flat = fake_collator(rows, seq_len, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, rows, seq_len) for k, v in flat.items()}
    tokens_per_step = rows * seq_len

    for step in range(1, 3):  # warmup/compile
        m = engine.train_step(batch, step)
        float(m["total_loss"])

    n_steps = int(os.environ.get("BENCH_STEPS", 6))
    times = []
    for step in range(3, 3 + n_steps):
        t0 = time.time()
        m = engine.train_step(batch, step)
        float(m["total_loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))

    tokens_per_sec_chip = tokens_per_step / dt / n_dev
    # active params per token: dense part + topk experts + embed-tied head
    active = (engine.num_params
              - cfg.num_hidden_layers * cfg.n_routed_experts * 3
              * cfg.hidden_size * cfg.moe_intermediate_size
              + cfg.num_hidden_layers * cfg.num_experts_per_tok * 3
              * cfg.hidden_size * cfg.moe_intermediate_size)
    # Attention train FLOPs/token/layer = 6 * (heads*head_dim) * seq/2 * 2:
    # qk^T + a.v each do heads*head_dim*seq/2 MACs per token (causal average,
    # which is what the flash kernel executes — masked tiles are DMA-pruned),
    # x2 flops/MAC, x3 for fwd+bwd. NOTE: rounds <=2 used hidden_size here,
    # undercounting attention 2x for this Qwen3-style head-expanded config
    # (heads*head_dim = 2*hidden); mfu_prev_formula keeps the old accounting
    # for cross-round continuity (see docs/kernels.md "MFU accounting").
    attn = cfg.attention
    q_dim = attn.num_attention_heads * attn.head_dim
    attn_flops = 6 * cfg.num_hidden_layers * q_dim * seq_len // 2 * 2
    attn_flops_old = 6 * cfg.num_hidden_layers * cfg.hidden_size * 2 * seq_len // 2
    mfu = (6 * active + attn_flops) * tokens_per_sec_chip / 197e12  # v5e bf16 peak
    mfu_old = (6 * active + attn_flops_old) * tokens_per_sec_chip / 197e12
    baseline = 2000.0  # reference BF16 tokens/GPU/s at 64k (BASELINE.md)
    print(json.dumps({
        "metric": "moe_sft_64k_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec_chip, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_sec_chip / baseline, 3),
        "mfu": round(mfu, 4),
        "mfu_prev_formula": round(mfu_old, 4),
        "step_time_s": round(dt, 3),
        "seq_len": seq_len,
        "total_params_m": round(engine.num_params / 1e6, 1),
        "n_layers": cfg.num_hidden_layers,
        "n_experts": cfg.n_routed_experts,
        "top_k": cfg.num_experts_per_tok,
    }))


if __name__ == "__main__":
    main()
