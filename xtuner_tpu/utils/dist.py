"""Multihost initialization.

Reference: torchrun/NCCL process bootstrap (entry_point.py:317-330) +
jax.distributed equivalent noted in SURVEY §2.5. JAX is single-controller per
process; multihost pods need jax.distributed.initialize() before any backend
touch. Driven by env vars so the same CLI works on 1 host or a pod:

  XTUNER_COORDINATOR=host:port XTUNER_NUM_PROCESSES=N XTUNER_PROCESS_ID=i
  (or the standard TPU pod metadata, in which case initialize() needs no args)
"""

from __future__ import annotations

import os

from .logger import get_logger, set_rank

logger = get_logger()

_INITIALIZED = False


def maybe_init_distributed() -> int:
    """Initialize multihost JAX if configured; returns process index."""
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_index()
    coordinator = os.environ.get("XTUNER_COORDINATOR")
    num_procs = os.environ.get("XTUNER_NUM_PROCESSES")
    if coordinator and num_procs:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_procs),
            process_id=int(os.environ.get("XTUNER_PROCESS_ID", "0")),
        )
        _INITIALIZED = True
        logger.info(f"jax.distributed initialized: process {jax.process_index()} "
                    f"of {jax.process_count()}")
    elif os.environ.get("XTUNER_MULTIHOST", "").lower() in ("1", "true"):
        # TPU pod: coordinates via metadata
        jax.distributed.initialize()
        _INITIALIZED = True
    set_rank(jax.process_index())
    return jax.process_index()


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
