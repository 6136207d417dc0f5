"""BASELINE config 3: InternVL-style 8B multimodal SFT — dynamic image tiling
+ vision-token packing fused into the input pipeline.

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_internvl_8b_vlm.py
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.compose import ComposeConfig
from xtuner_tpu.model.qwen import qwen3_8b
from xtuner_tpu.model.vision import ViTConfig
from xtuner_tpu.train.trainer import TrainerConfig

model = ComposeConfig(
    vision_cfg=ViTConfig(image_size=448, patch_size=14, hidden_size=1024,
                         intermediate_size=4096, num_hidden_layers=24,
                         num_attention_heads=16, downsample_ratio=0.5),
    text_cfg=qwen3_8b(),
    image_context_token_id=151667,  # <IMG_CONTEXT> in the extended tokenizer
    freeze_vision=True,
)

trainer = TrainerConfig(
    model_cfg=model,
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/vlm_sft.jsonl", class_name="internvl")],
        pack_max_length=16384,
        max_tiles=48,           # static tile budget per micro-batch
        tokens_per_tile=256,    # 448/14 grid, 0.5 pixel-shuffle
        image_size=448,
        image_max_num=12,
    ),
    optim_cfg=AdamWConfig(lr=2e-5),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, remat_policy="save_attn"),
    global_batch_rows=8,
    micro_batch_rows=8,
    load_from="/path/to/InternVL-8B",
    tokenizer_path="/path/to/InternVL-8B",
    work_dir="work_dirs",
    exp_name="internvl_8b_vlm",
)
