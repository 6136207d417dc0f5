from .advantage import compute_advantage
from .grpo_loss import GRPOLossConfig, OREALLossConfig, grpo_loss, kl_penalty, oreal_loss
from .judger import GSM8KJudger, HTTPJudger, Judger
from .replay_buffer import ReplayBuffer, SampleGroup

__all__ = [
    "compute_advantage",
    "GRPOLossConfig",
    "OREALLossConfig",
    "grpo_loss",
    "oreal_loss",
    "kl_penalty",
    "Judger",
    "GSM8KJudger",
    "HTTPJudger",
    "ReplayBuffer",
    "SampleGroup",
    # RL scale plane (imported lazily to keep `import xtuner_tpu.rl` light):
    # .worker.RolloutWorker, .producer.AsyncProducer/chunked_rollout,
    # .health_manager.{WorkerRegistry,HealthManager}, .session_server.SessionServer,
    # .trace.RolloutTraceStore, .transport.{ColocateTransport,FilesystemTransport},
    # .disagg_trainer.RLDisaggregatedTrainer, .sandbox.{PythonSandbox,SandboxAgentLoop},
    # .session_server.SessionHTTPServer
]
