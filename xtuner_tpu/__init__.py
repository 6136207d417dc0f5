"""xtuner_tpu: a TPU-native LLM training engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of InternLM/xtuner V1
(reference: /root/reference): SFT/pretrain for dense and dropless-MoE LLMs,
packed varlen sequences, Ulysses sequence parallel, expert parallel, chunked
cross-entropy, HF checkpoint import/export, async sharded checkpointing, and
GRPO RL — designed for GSPMD meshes over ICI rather than NCCL/FSDP.
"""

__version__ = "0.1.0"
