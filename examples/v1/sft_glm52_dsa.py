"""GLM-5.2 SFT: DSA sparse attention (lightning indexer + top-k) + noaux
router + MTP, EP over a pod slice.

    python -m xtuner_tpu.train.cli.sft --config examples/v1/sft_glm52_dsa.py
"""

from xtuner_tpu.config import AdamWConfig, LRConfig, MeshConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.model.glm import glm_52
from xtuner_tpu.train.trainer import TrainerConfig

model = glm_52().model_copy(update={"dispatcher": "a2a"})

trainer = TrainerConfig(
    model_cfg=model,
    dataloader_cfg=DataloaderConfig(
        datasets=[DatasetConfig(anno_path="/data/sft_corpus", chat_template="glm52")],
        pack_max_length=32768,
        pack_balance="flops",
    ),
    optim_cfg=AdamWConfig(lr=2e-5),
    lr_cfg=LRConfig(warmup_ratio=0.03),
    mesh_cfg=MeshConfig(fsdp_size=-1, ep_size=16, sp_size=2, remat_policy="save_out_lse"),
    global_batch_rows=32,
    micro_batch_rows=1,
    epochs=1.0,
    load_from="/path/to/GLM-5.2",
    tokenizer_path="/path/to/GLM-5.2",
    exp_name="glm52_sft",
    checkpoint_interval=500,
    hf_interval=2000,
)
