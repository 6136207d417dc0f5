"""GPT-OSS 20B SFT: attention sinks + alternating sliding window, swiglu
clipped experts, Muon optimizer.

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_gpt_oss_20b.py
"""

from xtuner_tpu.config import LRConfig, MeshConfig
from xtuner_tpu.config.optim import MuonConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.gpt_oss import gpt_oss_20b
from xtuner_tpu.train.trainer import TrainerConfig

trainer = TrainerConfig(
    model_cfg=gpt_oss_20b(),
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/sft_corpus", chat_template="gpt-oss")],
        pack_max_length=16384,
    ),
    optim_cfg=MuonConfig(lr=0.01, adamw_lr=2e-5),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, ep_size=4, remat_policy="save_out_lse"),
    global_batch_rows=64,
    micro_batch_rows=2,
    epochs=1.0,
    load_from="/path/to/gpt-oss-20b",
    tokenizer_path="/path/to/gpt-oss-20b",
    exp_name="gpt_oss_sft",
    checkpoint_interval=500,
)
