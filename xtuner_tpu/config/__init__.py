from ..loss.ce_loss import CELossConfig
from ..parallel.mesh import MeshConfig
from .optim import AdamWConfig, LRConfig, MuonConfig, OptimConfig, build_lr_schedule, build_optimizer

__all__ = [
    "CELossConfig",
    "MeshConfig",
    "AdamWConfig",
    "MuonConfig",
    "LRConfig",
    "OptimConfig",
    "build_lr_schedule",
    "build_optimizer",
]
