"""Profile one bench train step and print an exclusive per-op time table.

Runs the bench model (env-overridable shape, see bench.py) for a few steps,
wraps one step in jax.profiler.trace, parses the chrome-trace json the dump
contains, and aggregates EXCLUSIVE device time per op name prefix. This is
the round-2/3 perf workflow for finding the non-attention tail.

Usage:  python tools/profile_bench.py [/tmp/xt_profile]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xt_profile"
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # run the bench main with a tiny step count but hook the timed region:
    # simplest robust approach — rebuild the engine exactly as bench does
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
        lm_loss_cfg=CELossConfig(chunk_size=2048, mode=os.environ.get("BENCH_CE", "fused")),
    )
    remat = os.environ.get(
        "BENCH_REMAT", "save_attn_residuals" if seq_len <= 16384 else "save_out_lse")
    mesh_cfg = MeshConfig(fsdp_size=n_dev, remat_policy=remat)
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-5), LRConfig(warmup_steps=2), mesh_cfg,
                        total_steps=100)
    engine.init_random(0)
    rows = int(os.environ.get("BENCH_ROWS", n_dev))
    flat = fake_collator(rows, seq_len, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, rows, seq_len) for k, v in flat.items()}

    for step in range(1, 3):
        float(engine.train_step(batch, step)["total_loss"])

    with jax.profiler.trace(out_dir):
        for step in range(3, 5):
            float(engine.train_step(batch, step)["total_loss"])

    print(summarize(out_dir))


def summarize(out_dir: str, top: int = 30) -> str:
    """EXCLUSIVE per-op device time from the chrome trace's 'XLA Ops' lane
    (events nest by timestamp: a parent's exclusive time subtracts its
    children, so while/cond/checkpoint wrappers don't double count)."""
    import re

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        return f"no trace json under {out_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    ev = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    ops_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
                and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"
                and e["pid"] in dev_pids}
    lane = [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in ops_tids]
    lane.sort(key=lambda e: (e["ts"], -e["dur"]))
    excl = collections.Counter()
    excl_src = collections.Counter()
    src = {}
    stack = []  # (ts, dur, name, source, child_time)

    def pop():
        ts, dur, name, source, child = stack.pop()
        excl[name] += dur - child
        excl_src[(name, source)] += dur - child
        if stack:
            s = stack[-1]
            stack[-1] = (s[0], s[1], s[2], s[3], s[4] + dur)

    for e in lane:
        while stack and e["ts"] >= stack[-1][0] + stack[-1][1]:
            pop()
        s = e.get("args", {}).get("source") or ""
        stack.append((e["ts"], e["dur"], e["name"], s, 0))
        if s:
            src.setdefault(re.sub(r"[.\d]+$", "", e["name"]), s)
    while stack:
        pop()

    agg = collections.Counter()
    for name, d in excl.items():
        agg[re.sub(r"[.\d]+$", "", name)] += d
    total = sum(agg.values())
    lines = [f"total exclusive device time: {total/1e6:.3f} s (over the traced steps)"]
    for name, dur in agg.most_common(top):
        lines.append(f"{dur/1e6:9.3f} s  {100*dur/max(total,1):5.1f}%  {name:32s} "
                     f"{src.get(name, '')}")
    # second table: same exclusive times keyed by (op-kind, source line) so
    # generic names ("fusion") don't collapse distinct program regions into
    # one mislabeled bucket
    agg2 = collections.Counter()
    for (name, s), d in excl_src.items():
        agg2[(re.sub(r"[.\d]+$", "", name), s)] += d
    lines.append("\nby (op, source):")
    for (name, s), dur in agg2.most_common(top):
        lines.append(f"{dur/1e6:9.3f} s  {100*dur/max(total,1):5.1f}%  {name:24s} {s}")
    return "\n".join(lines)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2]))
    else:
        main()
