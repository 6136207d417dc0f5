"""Activation sharding context threaded through model forwards."""

from __future__ import annotations

from typing import Any, Optional

from jax.sharding import Mesh, PartitionSpec as P

from .mesh import with_logical_constraint


class ShardCtx:
    """Callable applying logical sharding constraints; no-op without a mesh.

    Usage: ``x = sc(x, "batch", "seq", None)``. This is the GSPMD replacement
    for the reference's per-module device-mesh plumbing: annotating the same
    global array differently before/after attention *is* Ulysses SP — XLA
    inserts the all_to_all (SURVEY.md §2.6).
    """

    def __init__(self, mesh: Optional[Mesh] = None, rules: Optional[dict[str, Any]] = None):
        self.mesh = mesh
        self.rules = rules or {}

    def __call__(self, x, *axes):
        if self.mesh is None or self.mesh.empty:
            return x
        return with_logical_constraint(x, P(*axes), self.mesh, self.rules)


NULL_SHARD_CTX = ShardCtx(None)
