"""BASELINE config 1: Qwen2.5-0.5B LoRA SFT on the demo Alpaca jsonl —
single process, CPU-runnable (toy demo data; point load_from/tokenizer at a
real HF checkpoint dir for the full run).

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_qwen25_05b_lora.py
"""

from pathlib import Path

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.qwen import qwen2_5_0_5b
from xtuner_tpu.module.lora import LoraConfig
from xtuner_tpu.train.trainer import TrainerConfig

_DATA = Path(__file__).parent.parent / "demo_data" / "alpaca_demo.jsonl"

model = qwen2_5_0_5b().model_copy(update={"lora_cfg": LoraConfig(r=16, alpha=32)})

trainer = TrainerConfig(
    model_cfg=model,
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path=str(_DATA), chat_template="qwen")],
        pack_max_length=2048,
    ),
    optim_cfg=AdamWConfig(lr=2e-4),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(),
    global_batch_rows=8,
    micro_batch_rows=1,
    epochs=3.0,
    # load_from="/path/to/Qwen2.5-0.5B-Instruct",  # HF checkpoint
    # tokenizer_path="/path/to/Qwen2.5-0.5B-Instruct",
    work_dir="work_dirs",
    exp_name="qwen25_05b_lora",
)
