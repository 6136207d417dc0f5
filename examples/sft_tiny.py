"""Tiny CPU-runnable SFT config (analog of the reference's
examples/v1/config/sft_qwen3_tiny.py: 2 layers, toy tokenizer).

    python -m xtuner_tpu.train.cli.sft --config examples/sft_tiny.py
"""

from pathlib import Path

from xtuner_tpu.config import AdamWConfig, CELossConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.train.trainer import TrainerConfig

_HERE = Path(__file__).parent

trainer = TrainerConfig(
    model_cfg=DenseConfig(
        vocab_size=300,  # UTF8 byte toy tokenizer
        num_hidden_layers=2,
        hidden_size=64,
        intermediate_size=128,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=16),
        lm_loss_cfg=CELossConfig(chunk_size=256),
    ),
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path=str(_HERE / "demo_data" / "alpaca_demo.jsonl"))],
        pack_max_length=256,
    ),
    optim_cfg=AdamWConfig(lr=1e-3),
    lr_cfg=LRConfig(warmup_steps=2),
    mesh_cfg=MeshConfig(param_dtype="float32"),
    global_batch_rows=4,
    micro_batch_rows=4,
    total_steps=12,
    checkpoint_interval=6,
    work_dir="work_dirs",
    exp_name="sft_tiny",
)
