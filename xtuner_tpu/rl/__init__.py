from .advantage import compute_advantage
from .grpo_loss import GRPOLossConfig, grpo_loss
from .judger import GSM8KJudger, Judger
from .replay_buffer import ReplayBuffer, SampleGroup

__all__ = [
    "compute_advantage",
    "GRPOLossConfig",
    "grpo_loss",
    "Judger",
    "GSM8KJudger",
    "ReplayBuffer",
    "SampleGroup",
    # RL scale plane (imported lazily to keep `import xtuner_tpu.rl` light):
    # .worker.RolloutWorker, .producer.AsyncProducer/chunked_rollout,
    # .health_manager.{WorkerRegistry,HealthManager}, .session_server.SessionServer,
    # .trace.RolloutTraceStore, .transport.{ColocateTransport,FilesystemTransport},
    # .disagg_trainer.RLDisaggregatedTrainer
]
