"""Profile the paged decode step and print an exclusive per-op time table.

Same trace workflow as tools/profile_bench.py but over the decode chain of
tools/bench_decode.py (shape via DEC_* env vars).

Usage:  python tools/profile_decode.py [/tmp/xt_decode_profile]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_bench import summarize  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xt_decode_profile"
    import jax
    import numpy as np

    from tools.bench_decode import build, chain_steps

    batch = int(os.environ.get("DEC_BATCH", 64))
    ctx = int(os.environ.get("DEC_CTX", 2048))
    layers = int(os.environ.get("DEC_LAYERS", 12))
    kv_heads = int(os.environ.get("DEC_KV", 2))
    block_size = int(os.environ.get("DEC_BLOCK", 128))
    _, _, _, pg, _ = build(batch, ctx, layers, kv_heads, block_size)

    np.asarray(chain_steps(pg, batch, ctx, 2))  # warmup/compile
    with jax.profiler.trace(out_dir):
        np.asarray(chain_steps(pg, batch, ctx, 16))
    print(summarize(out_dir))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2]))
    else:
        main()
