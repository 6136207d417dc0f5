"""Qwen3-8B DPO preference training (frozen reference model, sigmoid loss).

    python -c "from xtuner_tpu.utils.config import Config; \
               cfg = Config.fromfile('examples/v1/dpo_qwen3_8b.py'); \
               cfg['trainer'].build().fit()"
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.model.qwen import qwen3_8b
from xtuner_tpu.train.preference import DPOLossConfig, PreferenceTrainerConfig

trainer = PreferenceTrainerConfig(
    model_cfg=qwen3_8b(),
    data_path="/data/preference_pairs.jsonl",
    loss_cfg=DPOLossConfig(beta=0.1),
    optim_cfg=AdamWConfig(lr=5e-7),
    lr_cfg=LRConfig(warmup_ratio=0.1),
    mesh_cfg=MeshConfig(fsdp_size=-1, sp_size=2),
    max_length=4096,
    pairs_per_step=32,
    total_steps=500,
    load_from="/path/to/Qwen3-8B",
    tokenizer_path="/path/to/Qwen3-8B",
    work_dir="work_dirs",
    exp_name="qwen3_dpo",
)
