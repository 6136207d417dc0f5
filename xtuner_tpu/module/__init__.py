from .params import ParamSpec, init_params, param_shardings, cast_tree

__all__ = ["ParamSpec", "init_params", "param_shardings", "cast_tree"]
