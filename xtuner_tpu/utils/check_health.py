"""Accelerator health probe.

Reference: xtuner/v1/utils/check_health.py:16-60 — a deterministic matmul
chain compared across ranks to catch silent accelerator corruption. TPU
version: run the chain per-device via pmap-style sharding and compare every
device's result against device 0's (plus a NaN screen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .logger import get_logger

logger = get_logger()


def check_health(seed: int = 0, size: int = 512, iters: int = 8) -> bool:
    """Returns True if all local devices produce identical results."""
    devices = jax.local_devices()
    key = jax.random.key(seed)
    x = jax.random.normal(key, (size, size), jnp.float32)

    @jax.jit
    def chain(x):
        def body(i, acc):
            acc = acc @ x
            return acc / jnp.linalg.norm(acc)
        return jax.lax.fori_loop(0, iters, body, x)

    results = []
    for d in devices:
        y = chain(jax.device_put(x, d))
        results.append(np.asarray(jax.device_get(y)))
    ref = results[0]
    ok = True
    for i, r in enumerate(results):
        if not np.isfinite(r).all():
            logger.error(f"health check: device {i} produced non-finite values")
            ok = False
        elif not np.array_equal(r, ref):
            logger.error(f"health check: device {i} diverges from device 0 "
                         f"(max diff {np.abs(r - ref).max():.3e})")
            ok = False
    if ok:
        logger.info(f"health check OK across {len(devices)} device(s)")
    return ok
