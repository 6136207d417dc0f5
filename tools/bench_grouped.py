"""Microbench the MoE grouped-GEMM passes at the bench shape.

Times jax.lax.ragged_dot fwd / dgrad / wgrad (and optionally the Pallas bf16
grouped kernel) at the moe_heavy bench geometry, chained on-device (the axon
tunnel acks at enqueue — see TODO.md measurement discipline): each timed
program runs REPS dependent iterations inside one jit and the per-call time
is (t_chain - t_single) / (REPS - 1).

Usage: python tools/bench_grouped.py [M] [H] [I] [E]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, reps=24):
    """Marginal per-call time via chained dependent calls in one jit."""

    def chain(n):
        @jax.jit
        def run(*a):
            x = a[0]
            out = None
            for _ in range(n):
                out = fn(x, *a[1:])
                # serialize calls via a scalar dependency; 0*sum is NOT
                # constant-folded (0*NaN semantics keep XLA honest)
                dep = jax.tree.reduce(
                    lambda s, o: s + jnp.sum(o).astype(jnp.float32), out,
                    jnp.float32(0.0)) if isinstance(out, tuple) else jnp.sum(out)
                x = x + 0.0 * dep.astype(x.dtype)
            return dep

        return run

    short, long = chain(2), chain(reps)
    float(short(*args))  # compile + warm
    float(long(*args))
    t0 = time.time(); float(short(*args)); t1 = time.time()
    t2 = time.time(); float(long(*args)); t3 = time.time()
    return ((t3 - t2) - (t1 - t0)) / (reps - 2)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    i = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    e = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    key = jax.random.key(0)
    x = jax.random.normal(key, (m, h), jnp.bfloat16)
    w = jax.random.normal(key, (e, h, i), jnp.bfloat16) * 0.02
    g = jax.random.normal(key, (m, i), jnp.bfloat16)
    # balanced-ish ragged groups (same layout the bench produces)
    rng = np.random.default_rng(0)
    raw = rng.multinomial(m, np.ones(e) / e)
    gs = jnp.asarray(raw, jnp.int32)
    flops = 2 * m * h * i

    def fwd(x_, w_, gs_):
        return jax.lax.ragged_dot(x_, w_, gs_, preferred_element_type=jnp.bfloat16)

    t = timed(lambda x_, w_, gs_: fwd(x_, w_, gs_), (x, w, gs))
    print(f"ragged_dot fwd      ({m}x{h} @ {e}x{h}x{i}): {t*1e3:7.3f} ms  "
          f"{flops/t/1e12:6.1f} TF/s")

    # dgrad as autodiff transposes it: ragged_dot against w^T (the (E, N, K)
    # swap is hoisted out of the chain — steady-state cost only)
    wt = jnp.swapaxes(w, 1, 2)
    t = timed(lambda g_, wt_, gs_: jax.lax.ragged_dot(
        g_, wt_, gs_, preferred_element_type=jnp.bfloat16), (g, wt, gs))
    print(f"ragged_dot dgrad    : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    # wgrad with a REAL cotangent (data-dependent, nothing constant-folds)
    def loss_w(g_, w_, gs_):
        return jnp.sum(fwd(x, w_, gs_).astype(jnp.float32) * g_.astype(jnp.float32))

    dwgrad = jax.grad(loss_w, argnums=1)
    t = timed(lambda g_, w_, gs_: dwgrad(g_, w_, gs_), (g, w, gs))
    print(f"ragged_dot wgrad    : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s "
          f"(incl fwd recompute: ~2x flops)")

    if os.environ.get("BENCH_PALLAS_GROUPED"):
        from xtuner_tpu.ops.bf16_grouped import (
            grouped_gemm_bf16,
            grouped_gemm_bf16_dw,
        )

        # on-chip parity first (interpret-mode tests don't prove Mosaic
        # copy-out semantics): vs the ragged_dot oracle
        want = jax.jit(fwd)(x, w, gs)
        got = jax.jit(lambda a, b, c: grouped_gemm_bf16(a, b, c))(x, w, gs)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"pallas fwd max|diff| vs ragged_dot: {err:.4f}")
        assert err < 0.5, "pallas bf16 grouped fwd disagrees with ragged_dot"

        t = timed(lambda x_, w_, gs_: grouped_gemm_bf16(x_, w_, gs_), (x, w, gs))
        print(f"pallas bf16 fwd     : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")
        t = timed(lambda g_, w_, gs_: grouped_gemm_bf16(g_, w_, gs_, transpose_rhs=True),
                  (g, w, gs))
        print(f"pallas bf16 dgrad   : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")
        t = timed(lambda x_, g_, gs_: grouped_gemm_bf16_dw(x_, g_, gs_, e), (x, g, gs))
        print(f"pallas bf16 wgrad   : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
