"""Reward model training (Bradley-Terry on preference pairs).

Reference capability: legacy v0 xtuner/model/reward.py — base LM + scalar
value head scoring the last token of each sequence; pairwise logistic loss
r(chosen) > r(rejected). Reuses the preference data pipeline.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from ..config.optim import AdamWConfig, LRConfig, OptimConfig
from ..data_proto import SequenceContext
from ..datasets.collator import sft_llm_collator
from ..datasets.jsonl import JsonlDataset
from ..datasets.sampler import ParallelSampler
from ..engine.train_engine import TrainEngine
from ..module.params import ParamSpec
from ..parallel.mesh import MeshConfig
from ..utils.logger import get_logger
from ..writer import JsonlWriter
from .preference import PreferenceTokenizeFn

logger = get_logger()


class RewardHeadMixin:
    """Adds a scalar value head to any base model's specs/forward."""

    @staticmethod
    def head_spec(hidden_size: int) -> dict:
        return {"v_head": {"w": ParamSpec((hidden_size, 1), ("embed_shard", None), scale=0.01)}}

    @staticmethod
    def score(base_model, params, seq_ctx, compute_dtype, sc):
        """-> (B,) reward: value head on the last real token's hidden state."""
        hidden = base_model.forward(params["base"], seq_ctx, sc=sc, compute_dtype=compute_dtype)
        values = (hidden @ params["v_head"]["w"].astype(compute_dtype))[..., 0]  # (B, L)
        mask = seq_ctx.segment_ids != 0
        last_idx = jnp.sum(mask, axis=1) - 1  # one packed doc per row
        return jnp.take_along_axis(values, last_idx[:, None], axis=1)[:, 0].astype(jnp.float32)


class RewardTrainerConfig(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)
    model_cfg: Any
    data_path: str  # preference jsonl {"chosen": [...], "rejected": [...]}
    optim_cfg: OptimConfig = AdamWConfig(lr=1e-5)
    lr_cfg: LRConfig = LRConfig()
    mesh_cfg: MeshConfig = MeshConfig()
    pairs_per_step: int = 4
    max_length: int = 2048
    total_steps: Optional[int] = None
    epochs: float = 1.0
    load_from: Optional[str] = None
    tokenizer_path: Optional[str] = None
    chat_template: str = "qwen"
    work_dir: str = "work_dirs"
    exp_name: str = "reward"
    seed: int = 0

    def build(self) -> "RewardTrainer":
        return RewardTrainer(self)


class _RewardModelAdapter:
    """Wraps a base model so TrainEngine sees {base, v_head} specs."""

    def __init__(self, base_cfg):
        self.cfg = base_cfg
        self.base = base_cfg.build()

    def param_specs(self):
        return {"base": self.base.param_specs(),
                **RewardHeadMixin.head_spec(self.cfg.hidden_size)}

    def hf_key_map(self):
        from ..checkpoint.spec import HFKey

        return {"base": self.base.hf_key_map(),
                "v_head": {"w": HFKey("<random>")}}

    def merge_lora(self, params):
        return params

    def loss(self, *a, **k):  # engine default loss unused (custom loss fn)
        raise NotImplementedError


class _AdapterConfig:
    """Duck-typed model_cfg for TrainEngine."""

    def __init__(self, base_cfg):
        self.base_cfg = base_cfg
        self.lm_loss_cfg = base_cfg.lm_loss_cfg
        self.lora_cfg = None

    def build(self):
        return _RewardModelAdapter(self.base_cfg)


class RewardTrainer:
    def __init__(self, cfg: RewardTrainerConfig):
        self.cfg = cfg
        self.work_dir = Path(cfg.work_dir) / cfg.exp_name
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.tokenizer = self._build_tokenizer()
        fn = PreferenceTokenizeFn(self.tokenizer, cfg.chat_template, cfg.max_length)
        self.dataset = JsonlDataset(cfg.data_path, fn)
        self.sampler = iter(ParallelSampler(len(self.dataset), seed=cfg.seed))
        steps_per_epoch = max(len(self.dataset) // cfg.pairs_per_step, 1)
        self.total_steps = cfg.total_steps or max(int(steps_per_epoch * cfg.epochs), 1)
        self.engine = TrainEngine(_AdapterConfig(cfg.model_cfg), cfg.optim_cfg, cfg.lr_cfg,
                                  cfg.mesh_cfg, self.total_steps)
        if cfg.load_from:
            self.engine.from_hf(cfg.load_from)
        else:
            self.engine.init_random(cfg.seed)
        self.writer = JsonlWriter(self.work_dir)
        self._step_fn = None

    def _build_tokenizer(self):
        if self.cfg.tokenizer_path:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(self.cfg.tokenizer_path, trust_remote_code=True)
        from .toy_tokenizer import UTF8ByteTokenizer

        return UTF8ByteTokenizer()

    def _next_batch(self):
        rows = []
        for _ in range(self.cfg.pairs_per_step):
            item = self.dataset[next(self.sampler)]
            rows.append([item["chosen"]])
            rows.append([item["rejected"]])
        batch = sft_llm_collator(rows, self.cfg.max_length)
        return {k: v[None] for k, v in batch.items()}

    def _loss_fn(self):
        adapter = self.engine.model
        sc, dtype = self.engine.sc, self.engine.compute_dtype

        def loss_fn(params, mb, denom):
            seq_ctx = SequenceContext(input_ids=mb["input_ids"],
                                      segment_ids=mb["segment_ids"],
                                      position_ids=mb["position_ids"])
            r = RewardHeadMixin.score(adapter.base, params, seq_ctx, dtype, sc)
            rc, rr = r[0::2], r[1::2]
            loss = -jnp.mean(jax.nn.log_sigmoid(rc - rr))
            acc = jnp.mean((rc > rr).astype(jnp.float32))
            return loss, {"reward_acc": acc, "reward_margin": jnp.mean(rc - rr)}

        return loss_fn

    def fit(self) -> None:
        for step in range(1, self.total_steps + 1):
            t0 = time.time()
            batch = self._next_batch()
            if self._step_fn is None:
                self._step_fn = self.engine._build_step_fn(self._loss_fn())
            device_batch = self.engine.put_batch(batch)
            self.engine.params, self.engine.opt_state, metrics = self._step_fn(
                self.engine.params, self.engine.opt_state,
                jnp.asarray(step, jnp.int32), device_batch)
            metrics = {k: float(v) for k, v in metrics.items()}
            logger.info(
                f"RM Step {step}/{self.total_steps} loss {metrics['total_loss']:.4f} "
                f"acc {metrics['reward_acc']:.3f} margin {metrics['reward_margin']:.4f} "
                f"grad_norm {metrics['grad_norm']:.3f} step {time.time()-t0:.2f}s")
            self.writer.add_scalars(metrics, step)
        self.writer.close()
