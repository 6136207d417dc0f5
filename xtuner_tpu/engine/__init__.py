from .train_engine import EngineConfig, TrainEngine

__all__ = ["EngineConfig", "TrainEngine"]
