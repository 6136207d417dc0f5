"""Qwen3.5 hybrid-MoE SFT: 3 GatedDeltaNet : 1 gated-full-attention pattern,
256-expert MoE with gated shared expert, partial rotary 0.25.

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_qwen35_hybrid.py
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.hybrid import qwen3_5_moe_35b_a3b
from xtuner_tpu.train.trainer import TrainerConfig

trainer = TrainerConfig(
    model_cfg=qwen3_5_moe_35b_a3b(),
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/sft_corpus", chat_template="qwen35")],
        pack_max_length=16384,
    ),
    optim_cfg=AdamWConfig(lr=2e-5),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, ep_size=8, remat_policy="save_out_lse"),
    global_batch_rows=64,
    micro_batch_rows=1,
    epochs=2.0,
    load_from="/path/to/Qwen3.5-35B-A3B",
    tokenizer_path="/path/to/Qwen3.5-35B-A3B",
    exp_name="qwen35_hybrid_sft",
    checkpoint_interval=500,
)
