"""BASELINE config 2: Qwen3-8B dense full-param SFT with 32k packed sequences
(FSDP over a v5p-8 style mesh).

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_qwen3_8b_32k.py
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.qwen import qwen3_8b
from xtuner_tpu.train.trainer import TrainerConfig

trainer = TrainerConfig(
    model_cfg=qwen3_8b(),
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/sft.jsonl", chat_template="qwen")],
        pack_max_length=32768,
        num_workers=1,
    ),
    optim_cfg=AdamWConfig(lr=1e-5),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, remat_policy="save_attn"),
    global_batch_rows=8,
    micro_batch_rows=8,
    epochs=1.0,
    load_from="/path/to/Qwen3-8B",
    tokenizer_path="/path/to/Qwen3-8B",
    checkpoint_interval=500,
    hf_interval=2000,
    work_dir="work_dirs",
    exp_name="qwen3_8b_sft_32k",
)
