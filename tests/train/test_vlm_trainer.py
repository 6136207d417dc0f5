"""End-to-end VLM SFT: jsonl with image files -> tiling -> trainer fit."""

import json

import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.compose import ComposeConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.vision import ViTConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.parallel.mesh import MeshConfig
from xtuner_tpu.train.trainer import Trainer, TrainerConfig


@pytest.mark.slow
def test_vlm_trainer_fit(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data = tmp_path / "vlm.jsonl"
    with open(data, "w") as f:
        for i in range(16):
            img_path = img_dir / f"{i}.npy"
            np.save(img_path, rng.integers(0, 255, (56, 28, 3)).astype(np.uint8))
            f.write(json.dumps({
                "messages": [
                    {"role": "user", "content": [
                        {"type": "image", "image": str(img_path)},
                        {"type": "text", "text": f"describe image {i}"},
                    ]},
                    {"role": "assistant", "content": f"image number {i} shows noise"},
                ]
            }) + "\n")

    # toy tokenizer with the image specials
    from xtuner_tpu.train import trainer as trainer_mod
    from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer

    monkeypatch.setattr(
        trainer_mod.Trainer, "_build_tokenizer",
        lambda self: UTF8ByteTokenizer(extra_specials=["<img>", "</img>", "<IMG_CONTEXT>"]),
    )

    vit = ViTConfig(image_size=28, patch_size=7, hidden_size=16, intermediate_size=32,
                    num_hidden_layers=2, num_attention_heads=2, downsample_ratio=0.5)
    cfg = TrainerConfig(
        model_cfg=ComposeConfig(
            vision_cfg=vit,
            text_cfg=DenseConfig(
                vocab_size=262, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
                attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
                lm_loss_cfg=CELossConfig(chunk_size=128),
            ),
            image_context_token_id=261,
            freeze_vision=True,
        ),
        dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path=str(data), class_name="internvl")],
            pack_max_length=256,
            max_tiles=48,
            tokens_per_tile=4,
            image_size=28,
            image_max_num=2,
        ),
        optim_cfg=AdamWConfig(lr=1e-3),
        lr_cfg=LRConfig(warmup_steps=1),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        global_batch_rows=8,
        micro_batch_rows=8,
        total_steps=3,
        work_dir=str(tmp_path / "work"),
        exp_name="vlm",
    )
    trainer = Trainer(cfg)
    trainer.fit()
    lines = [json.loads(x) for x in (trainer.work_dir / "tracker.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    assert all(np.isfinite(r["reduced_llm_loss"]) for r in lines)
