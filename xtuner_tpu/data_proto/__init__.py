from .sequence_context import SequenceContext

__all__ = ["SequenceContext"]
