from .jsonl_writer import JsonlWriter
from .tb_writer import TensorboardWriter

__all__ = ["JsonlWriter", "TensorboardWriter"]
