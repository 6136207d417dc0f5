from .profile import profiling_memory, profiling_time

__all__ = ["profiling_time", "profiling_memory"]
