"""Microbenchmark the flash kernel fwd / fwd+bwd at long context on the chip.

Usage: python tools/bench_flash.py [seq_len] [block]
Prints per-config ms + achieved TFLOP/s (causal halves the FLOPs).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.ops.attention.flash import flash_attention


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    blocks = [int(b) for b in sys.argv[2:]] or [1024]
    b, hq, hkv, d = 1, 16, 8, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, seq, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, seq, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, seq, hkv, d)), jnp.bfloat16)
    seg = jnp.ones((b, seq), jnp.int32)

    # causal: ~L^2/2 positions, 2 matmuls fwd (QK + PV), each 2*d FLOPs/pos
    fwd_flops = b * hq * (seq * seq / 2) * 2 * d * 2
    bwd_flops = 2.5 * fwd_flops  # dq + dkv kernels re-do s/p + 3 grad matmuls

    import os
    maxl = jnp.float32(20.0) if os.environ.get("BENCH_MAX_LOGIT") else None

    for block in blocks:
        fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, seg, causal=True, max_logit=maxl,
                                                      block_q=block, block_k=block))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, seg, causal=True, max_logit=maxl,
                                           block_q=block, block_k=block).astype(jnp.float32))

        fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        o = fwd(q, k, v); jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(3):
            o = fwd(q, k, v)
            jax.block_until_ready(o)
        t_fwd = (time.time() - t0) / 3

        g = fb(q, k, v); jax.block_until_ready(g)
        t0 = time.time()
        for _ in range(3):
            g = fb(q, k, v)
            jax.block_until_ready(g)
        t_fb = (time.time() - t0) / 3
        t_bwd = t_fb - t_fwd

        print(f"block={block} seq={seq}: fwd {t_fwd*1e3:.1f} ms "
              f"({fwd_flops/t_fwd/1e12:.1f} TF/s), fwd+bwd {t_fb*1e3:.1f} ms, "
              f"bwd-only {t_bwd*1e3:.1f} ms ({bwd_flops/max(t_bwd,1e-9)/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
