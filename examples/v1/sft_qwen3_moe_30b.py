"""BASELINE config 4: Qwen3-30B-A3B dropless MoE SFT — grouped expert GEMM +
ragged all-to-all over ICI (matches the reference CI golden config:
pack 16,384, global batch 16).

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_qwen3_moe_30b.py
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.moe import qwen3_moe_30b_a3
from xtuner_tpu.train.trainer import TrainerConfig

model = qwen3_moe_30b_a3().model_copy(update={"dispatcher": "a2a"})

trainer = TrainerConfig(
    model_cfg=model,
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/alpaca.jsonl", chat_template="qwen")],
        pack_max_length=16384,
    ),
    optim_cfg=AdamWConfig(lr=6e-5),
    lr_cfg=LRConfig(lr_type="cosine", warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, ep_size=8, remat_policy="save_attn"),
    global_batch_rows=16,
    micro_batch_rows=16,
    epochs=1.0,
    load_from="/path/to/Qwen3-30B-A3B",
    tokenizer_path="/path/to/Qwen3-30B-A3B",
    checkpoint_interval=200,
    work_dir="work_dirs",
    exp_name="qwen3_moe_30b_sft",
)
