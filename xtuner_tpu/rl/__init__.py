from .advantage import compute_advantage
from .grpo_loss import GRPOLossConfig, grpo_loss
from .judger import GSM8KJudger, Judger
from .replay_buffer import ReplayBuffer

__all__ = [
    "compute_advantage",
    "GRPOLossConfig",
    "grpo_loss",
    "Judger",
    "GSM8KJudger",
    "ReplayBuffer",
]
