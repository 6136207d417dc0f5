"""On-chip validation + microbench for the fused expert-MLP Pallas kernel.

Interpret-mode tests (tests/ops/test_fused_moe_mlp.py) prove the algorithm;
this tool proves the MOSAIC lowering on the real chip (TODO.md sharp edge:
interpret mode does not catch TPU tiling/copy-out semantics) and measures
whether fusing beats the decomposed pipeline at the bench geometry.

Usage: python tools/bench_fused_mlp.py [M] [H] [F] [E]
Defaults: the moe_heavy bench routed-row shape (16384 tok x top-8 = 131072
rows, H 1024, F 768, E 16).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, reps=16):
    """Marginal per-call time via chained dependent calls in one jit
    (axon tunnel acks at enqueue — see TODO.md measurement discipline)."""

    def chain(n):
        @jax.jit
        def run(*a):
            x = a[0]
            dep = jnp.float32(0.0)
            for _ in range(n):
                out = fn(x, *a[1:])
                dep = jax.tree.reduce(
                    lambda s, o: s + jnp.sum(o).astype(jnp.float32),
                    out, jnp.float32(0.0)) if isinstance(out, tuple) else jnp.sum(out)
                x = x + 0.0 * dep.astype(x.dtype)
            return dep

        return run

    short, long = chain(2), chain(reps)
    float(short(*args))
    float(long(*args))
    t0 = time.time(); float(short(*args)); t1 = time.time()
    t2 = time.time(); float(long(*args)); t3 = time.time()
    return ((t3 - t2) - (t1 - t0)) / (reps - 2)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    e = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from xtuner_tpu.ops.bf16_grouped import bf16_grouped_linear
    from xtuner_tpu.ops.fused_moe_mlp import fused_moe_mlp

    key = jax.random.key(0)
    x = jax.random.normal(key, (m, h), jnp.bfloat16)
    w_gu = jax.random.normal(jax.random.key(1), (e, h, 2 * f), jnp.bfloat16) * 0.02
    w_dn = jax.random.normal(jax.random.key(2), (e, f, h), jnp.bfloat16) * 0.02
    rng = np.random.default_rng(0)
    gs = jnp.asarray(rng.multinomial(m, np.ones(e) / e), jnp.int32)
    cot = jax.random.normal(jax.random.key(3), (m, h), jnp.bfloat16)

    def decomposed(x_, wg_, wd_, gs_):
        # the model's decomposed path (moe_layer.py gemm_impl == "pallas")
        gu = bf16_grouped_linear(x_, wg_, gs_)
        gf = gu.astype(jnp.float32)
        hidden = (jax.nn.silu(gf[:, :f]) * gf[:, f:]).astype(x_.dtype)
        return bf16_grouped_linear(hidden, wd_, gs_)

    # ---- on-chip parity (fwd) ----
    want = jax.jit(decomposed)(x, w_gu, w_dn, gs)
    got = jax.jit(lambda a, b, c, d: fused_moe_mlp(a, b, c, d))(x, w_gu, w_dn, gs)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"fused fwd max|diff| vs decomposed (on-chip): {err:.5f}")
    assert err < 0.5, "fused MLP forward disagrees with decomposed path ON CHIP"

    # ---- on-chip parity (grads) ----
    # NOTE: cot/gs must be ARGUMENTS, not closure captures — jit bakes captured
    # arrays into the program as constants and the 256MB cotangent blows the
    # remote-compile body limit (HTTP 413) on the axon tunnel.
    def loss_f(x_, wg_, wd_, cot_, gs_):
        return jnp.sum(fused_moe_mlp(x_, wg_, wd_, gs_).astype(jnp.float32)
                       * cot_.astype(jnp.float32))

    def loss_d(x_, wg_, wd_, cot_, gs_):
        return jnp.sum(decomposed(x_, wg_, wd_, gs_).astype(jnp.float32)
                       * cot_.astype(jnp.float32))

    gf_ = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(x, w_gu, w_dn, cot, gs)
    gd_ = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))(x, w_gu, w_dn, cot, gs)
    for name, a, b in zip(("dx", "dw_gu", "dw_dn"), gf_, gd_):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
        print(f"grad {name:6s} max|diff| {d:10.4f}  (rel {d/scale:.2e})")
        assert d / scale < 5e-2, f"fused MLP {name} grad mismatch ON CHIP"

    # ---- timing ----
    mlp_flops = 2 * m * h * (2 * f) + 2 * m * f * h  # fwd only
    t = timed(lambda x_, wg_, wd_, gs_: decomposed(x_, wg_, wd_, gs_),
              (x, w_gu, w_dn, gs))
    print(f"decomposed fwd : {t*1e3:7.3f} ms  {mlp_flops/t/1e12:6.1f} TF/s")
    t = timed(lambda x_, wg_, wd_, gs_: fused_moe_mlp(x_, wg_, wd_, gs_),
              (x, w_gu, w_dn, gs))
    print(f"fused fwd      : {t*1e3:7.3f} ms  {mlp_flops/t/1e12:6.1f} TF/s")

    gflops = 3 * mlp_flops  # fwd recompute + dgrad + wgrad per GEMM pair
    t = timed(lambda x_, wg_, wd_, cot_, gs_:
              jax.grad(loss_d, argnums=(0, 1, 2))(x_, wg_, wd_, cot_, gs_),
              (x, w_gu, w_dn, cot, gs))
    print(f"decomposed grad: {t*1e3:7.3f} ms  {gflops/t/1e12:6.1f} TF/s")
    t = timed(lambda x_, wg_, wd_, cot_, gs_:
              jax.grad(loss_f, argnums=(0, 1, 2))(x_, wg_, wd_, cot_, gs_),
              (x, w_gu, w_dn, cot, gs))
    print(f"fused grad     : {t*1e3:7.3f} ms  {gflops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
