"""Parameter specification system.

The reference attaches parallelism to modules at runtime (FSDP2 `fully_shard`,
DTensor placements, LoadSpec — xtuner/v1/model/base.py:589-698, 1030-1171).
Here parameters are plain pytrees of jax.Arrays and each leaf has a static
`ParamSpec` declaring shape, init and *logical* sharding axes; meshes enter
only when specs are translated to NamedShardings. This one structure replaces
the reference's fully_shard / MixedPrecisionPolicy / ignored_params /
meta-device-init machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import named_sharding


@dataclass(frozen=True)
class ParamSpec:
    shape: tuple[int, ...]
    axes: tuple  # logical axis name (or None / tuple of names) per dim
    init: str = "normal"  # normal | zeros | ones | scaled_normal
    scale: float = 0.02  # stddev for normal init
    dtype: Any = jnp.float32  # master/storage dtype

    def initializer(self) -> Callable[[jax.Array], jax.Array]:
        if self.init == "zeros":
            return lambda key: jnp.zeros(self.shape, self.dtype)
        if self.init == "ones":
            return lambda key: jnp.ones(self.shape, self.dtype)
        if self.init == "normal":
            return lambda key: (jax.random.normal(key, self.shape, jnp.float32) * self.scale).astype(self.dtype)
        if self.init == "eye_plus_normal":
            # identity + scaled noise over the trailing square dims (FoPE
            # sin/cos coefficient init, reference rope.py:442-453)
            return lambda key: (jnp.eye(self.shape[-1], dtype=jnp.float32)
                                + jax.random.normal(key, self.shape, jnp.float32)
                                * self.scale).astype(self.dtype)
        raise ValueError(f"Unknown init {self.init!r}")


def _is_spec(x: Any) -> bool:
    return isinstance(x, ParamSpec)


def init_params(specs, rng: jax.Array):
    """Initialize a param pytree from a spec pytree, one folded key per leaf."""
    leaves, treedef = jax.tree.flatten(specs, is_leaf=_is_spec)
    params = []
    for i, spec in enumerate(leaves):
        params.append(spec.initializer()(jax.random.fold_in(rng, i)))
    return jax.tree.unflatten(treedef, params)


def param_shardings(specs, mesh: Mesh, rules: dict[str, Any]):
    """Spec pytree -> NamedSharding pytree (for jit in_shardings / device_put)."""
    return jax.tree.map(
        lambda s: named_sharding(mesh, P(*s.axes), rules), specs, is_leaf=_is_spec
    )


def abstract_params(specs):
    """Spec pytree -> ShapeDtypeStruct pytree (meta-device analog for eval_shape)."""
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), specs, is_leaf=_is_spec
    )


def cast_tree(params, dtype):
    """Cast float leaves to the compute dtype (the MixedPrecisionPolicy
    param_dtype cast, done inside the remat region so masters stay fp32)."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, params)


def stack_specs(specs, n: int, axis_name: str = "layers"):
    """Add a leading stacked dim (e.g. layers) to every spec leaf — parameters
    for `lax.scan`-over-layers models are stored stacked."""
    return jax.tree.map(
        lambda s: ParamSpec((n, *s.shape), (axis_name, *s.axes), init=s.init,
                            scale=s.scale, dtype=s.dtype),
        specs,
        is_leaf=_is_spec,
    )


def count_params(specs) -> int:
    import math

    leaves = jax.tree.leaves(specs, is_leaf=_is_spec)
    return sum(math.prod(s.shape) for s in leaves)
