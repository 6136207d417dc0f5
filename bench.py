"""Benchmark: dropless-MoE SFT training throughput.

Shapes reported in ONE JSON line (round-5 reorg per VERDICT r4 #3: the
expert-dominated shape is now PRIMARY — the old 64k primary had
expert_flop_share 0.01, i.e. it measured the flash kernel in a MoE costume):

- PRIMARY (`moe_heavy`): Qwen3-30B-A3B per-token active geometry (top-8,
  moe_inter 768, 16 experts) at seq 8192 — per-token expert FLOPs EXCEED
  attention FLOPs (expert_flop_share ~0.33 of total counted train FLOPs,
  ~0.55 of non-attention), so this measures the ragged grouped-GEMM +
  dispatch path the north-star workloads stress. North-star floor: MFU 0.35.
- `longctx_64k` sub-object: the round-1..4 primary (64k packed SFT, the
  reference's headline workload length, BASELINE.md) — kept for cross-round
  continuity; its MFU mostly measures the flash kernel.
- `fp8` sub-object (VERDICT r4 #8): the primary shape with tile-wise fp8
  expert+attention GEMMs — regression-tracked even while v5e (no fp8 MXU)
  makes it a slowdown; v6e+ lowers the same kernels to hardware fp8 dots.

`vs_baseline` caveat: the reference number is a 200B-class model sharded
over 256 Hopper-class GPUs; this bench is a ~0.5B single-chip shape (the
largest whose full fp32 AdamW state fits one 16 GB v5e — see docs/
kernels.md "memory wall"). The ratio is continuity across rounds, NOT a
like-for-like hardware comparison; `vs_baseline_note` says so in-band.

MFU formula: FROZEN as of round 4 (head-dim-correct attention accounting,
causal-half counting); `mfu_prev_formula` keeps the round-1/2 accounting.
Any further revision would break cross-round comparability — don't.
"""

from __future__ import annotations

import gc
import json
import os
import time

import numpy as np


def _build_cfg(*, layers, moe_inter, experts, topk, hidden=1024):
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.moe import MoEConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.router import GreedyRouterConfig

    cfg = MoEConfig(
        vocab_size=151936,
        num_hidden_layers=layers,
        hidden_size=hidden,
        intermediate_size=3072,
        moe_intermediate_size=moe_inter,
        n_routed_experts=experts,
        num_experts_per_tok=topk,
        tie_word_embeddings=True,
        rope_theta=1000000.0,
        balancing_loss_coef=0.001,
        router=GreedyRouterConfig(),
        attention=MHAConfig(num_attention_heads=16, num_key_value_heads=8, head_dim=128,
                            qk_norm=True),
        lm_loss_cfg=CELossConfig(chunk_size=2048,
                                 mode=os.environ.get("BENCH_CE", "fused")),
        grouped_gemm_impl=os.environ.get("BENCH_GEMM", "auto"),
    )
    if os.environ.get("BENCH_FP8"):  # tile-wise fp8 expert + attention GEMMs
        from xtuner_tpu.ops.float8 import Float8Config

        cfg = cfg.model_copy(update={"float8_cfg": Float8Config(
            e5m2_grads=os.environ.get("BENCH_FP8") == "e5m2")})
    return cfg


def _run_shape(cfg, seq_len: int, n_steps: int, rows_per_chip: int = 1) -> dict:
    """Train-step timing + MFU accounting for one (model, seq) shape."""
    import jax

    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.datasets.collator import fake_collator
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.parallel.mesh import MeshConfig

    n_dev = len(jax.devices())
    # 64k: the full (q,k,v,out,lse) residual set OOMs 16GB, but (out,lse)
    # alone fits — backward recomputes projections, never the fwd flash kernel
    remat = os.environ.get(
        "BENCH_REMAT",
        "save_attn_residuals" if seq_len <= 16384 else "save_out_lse")
    mesh_cfg = MeshConfig(fsdp_size=n_dev, remat_policy=remat)
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-5), LRConfig(warmup_steps=2), mesh_cfg,
                         total_steps=100)
    engine.init_random(0)

    rows = int(os.environ.get("BENCH_ROWS", n_dev * rows_per_chip))
    flat = fake_collator(rows, seq_len, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, rows, seq_len) for k, v in flat.items()}
    tokens_per_step = rows * seq_len

    for step in range(1, 3):  # warmup/compile
        m = engine.train_step(batch, step)
        float(m["total_loss"])

    times = []
    for step in range(3, 3 + n_steps):
        t0 = time.time()
        m = engine.train_step(batch, step)
        float(m["total_loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))

    tokens_per_sec_chip = tokens_per_step / dt / n_dev
    # active params per token: dense part + topk experts + embed-tied head
    expert_params = (cfg.num_hidden_layers * cfg.n_routed_experts * 3
                     * cfg.hidden_size * cfg.moe_intermediate_size)
    active_expert_params = (cfg.num_hidden_layers * cfg.num_experts_per_tok * 3
                            * cfg.hidden_size * cfg.moe_intermediate_size)
    active = engine.num_params - expert_params + active_expert_params
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
    expert_flops = 6 * active_expert_params
    mfu = (6 * active + attn_flops) * tokens_per_sec_chip / 197e12  # v5e bf16 peak
    mfu_old = (6 * active + attn_flops_old) * tokens_per_sec_chip / 197e12
    result = {
        "value": round(tokens_per_sec_chip, 1),
        "mfu": round(mfu, 4),
        "mfu_prev_formula": round(mfu_old, 4),
        "step_time_s": round(dt, 3),
        "seq_len": seq_len,
        "total_params_m": round(engine.num_params / 1e6, 1),
        "n_layers": cfg.num_hidden_layers,
        "n_experts": cfg.n_routed_experts,
        "top_k": cfg.num_experts_per_tok,
        "moe_inter": cfg.moe_intermediate_size,
        # share of counted train FLOPs spent in expert GEMMs — how much of
        # the number measures the MoE path vs the flash kernel
        "expert_flop_share": round(expert_flops / (6 * active + attn_flops), 3),
    }
    del engine, batch, flat
    gc.collect()
    return result


def _flash_provenance() -> dict:
    """Record which flash paths are active so perf deltas are attributable
    (VERDICT r4 #10)."""
    from xtuner_tpu.ops.attention import flash as _flash

    return {
        "attn_bwd": _flash.ATTN_BWD,
        "flash_block_k_fwd_env": os.environ.get("XTUNER_FLASH_BLOCK_K",
                                                "default(2x block_q)"),
    }


def main() -> None:
    n_steps = int(os.environ.get("BENCH_STEPS", 6))
    shape_env_overridden = any(
        os.environ.get(k) for k in
        ("BENCH_LAYERS", "BENCH_MOE_INTER", "BENCH_EXPERTS", "BENCH_TOPK",
         "BENCH_HIDDEN", "BENCH_SEQ"))

    # PRIMARY: MoE-heavy shape — Qwen3-30B-A3B per-token active geometry
    # (top-8, moe_inter 768) at 16 experts / seq 8192; per-token expert FLOPs
    # exceed attention FLOPs, so THIS measures ragged grouped-GEMM + dispatch,
    # not the flash kernel. rows_per_chip=2 is the largest batch whose fp32
    # AdamW state + saved residuals fit 16 GB (rows=3 OOMs by 0.5 GB).
    primary_cfg = _build_cfg(
        layers=int(os.environ.get("BENCH_LAYERS", 10)),
        moe_inter=int(os.environ.get("BENCH_MOE_INTER", 768)),
        experts=int(os.environ.get("BENCH_EXPERTS", 16)),
        topk=int(os.environ.get("BENCH_TOPK", 8)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 1024)),
    )
    primary = _run_shape(primary_cfg, int(os.environ.get("BENCH_SEQ", 8192)),
                         n_steps, rows_per_chip=2)

    out = {
        "metric": "moe_heavy_sft_8k_tokens_per_sec_per_chip",
        "unit": "tokens/s/chip",
        **primary,
        **_flash_provenance(),
        "vs_baseline": round(primary["value"] / 2000.0, 3),
        "vs_baseline_note": (
            "reference 2,000 tok/GPU/s is XTuner V1 BF16 FSDP on a 200B-class "
            "model at seq 64k over 256 Hoppers (BASELINE.md); this is a ~0.6B "
            "single-chip v5e expert-dominated shape at seq 8k — cross-scale "
            "continuity ratio, not a hardware comparison"
        ),
    }

    if not (shape_env_overridden or os.environ.get("BENCH_SKIP_LONGCTX")):
        # cross-round continuity shape (round 1-4 primary): 10L/64E/I128/top4
        # (the 1/16 expert-sparsity of Qwen3-30B-A3B), 470.8M params — the
        # biggest Qwen3-MoE-structured model whose full fp32 AdamW state PLUS
        # 64k saved residuals fits one 16 GB v5e (docs/kernels.md "memory
        # wall"). expert_flop_share 0.01: this one measures the flash kernel.
        lc_cfg = _build_cfg(layers=10, moe_inter=128, experts=64, topk=4)
        lc = _run_shape(lc_cfg, 65536, n_steps)
        out["longctx_64k"] = {"metric": "moe_sft_64k_tokens_per_sec_per_chip",
                              "unit": "tokens/s/chip", **lc}

    if not (shape_env_overridden or os.environ.get("BENCH_SKIP_FP8")):
        # fp8 regression row (VERDICT r4 #8): tile-wise fp8 on the primary
        # shape. v5e has no fp8 MXU (operands upconvert in-register) so this
        # is EXPECTED to trail bf16 here; the row exists so the grouped-fp8
        # stack has per-round tracking and a v6e+ baseline.
        os.environ["BENCH_FP8"] = "e4m3"
        try:
            fp8_cfg = _build_cfg(layers=10, moe_inter=768, experts=16, topk=8)
            fp8 = _run_shape(fp8_cfg, 8192, max(n_steps // 2, 2), rows_per_chip=2)
            out["fp8"] = {"metric": "moe_heavy_sft_8k_fp8_tokens_per_sec_per_chip",
                          "unit": "tokens/s/chip",
                          "vs_bf16": round(fp8["value"] / primary["value"], 3),
                          **fp8}
        finally:
            del os.environ["BENCH_FP8"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
