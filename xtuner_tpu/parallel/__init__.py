from .mesh import MeshConfig, build_mesh, logical_to_physical, named_sharding, with_logical_constraint

__all__ = [
    "MeshConfig",
    "build_mesh",
    "logical_to_physical",
    "named_sharding",
    "with_logical_constraint",
]
