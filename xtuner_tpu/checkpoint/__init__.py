from .spec import HFKey

__all__ = ["HFKey"]
