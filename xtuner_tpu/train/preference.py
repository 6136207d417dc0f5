"""Preference optimization: DPO / ORPO (+ BCO variants).

Reference capability: legacy v0 xtuner/model/dpo.py (DPO), orpo.py — SFT-style
training over (chosen, rejected) pairs. TPU design: pairs ride the batch dim
(even rows chosen, odd rows rejected), sequence logprobs come from the chunked
per-token path, the frozen reference policy is a second (non-optimized) param
tree on the same mesh.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from ..config.optim import AdamWConfig, LRConfig, OptimConfig
from ..data_proto import SequenceContext
from ..datasets.collator import sft_llm_collator
from ..datasets.jsonl import JsonlDataset
from ..datasets.sampler import ParallelSampler
from ..datasets.tokenize_fns import OpenaiSFTTokenizeFn
from ..engine.train_engine import TrainEngine
from ..loss.ce_loss import per_token_logprobs
from ..parallel.mesh import MeshConfig
from ..utils.logger import get_logger
from ..writer import JsonlWriter

logger = get_logger()


class DPOLossConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    loss_type: Literal["dpo", "orpo"] = "dpo"
    beta: float = 0.1
    label_smoothing: float = 0.0
    # ORPO: weight of the odds-ratio term added to the chosen NLL
    orpo_lambda: float = 0.1


def dpo_pair_loss(policy_c, policy_r, ref_c, ref_r, cfg: DPOLossConfig):
    """Sequence-level logprobs per pair -> scalar loss + metrics."""
    logits = cfg.beta * ((policy_c - ref_c) - (policy_r - ref_r))
    loss = -(jax.nn.log_sigmoid(logits) * (1 - cfg.label_smoothing)
             + jax.nn.log_sigmoid(-logits) * cfg.label_smoothing)
    acc = (logits > 0).astype(jnp.float32)
    margin = cfg.beta * (policy_c - ref_c) - cfg.beta * (policy_r - ref_r)
    return loss.mean(), {
        "reward_acc": acc.mean(),
        "reward_margin": margin.mean(),
        "chosen_reward": (cfg.beta * (policy_c - ref_c)).mean(),
        "rejected_reward": (cfg.beta * (policy_r - ref_r)).mean(),
    }


def orpo_pair_loss(policy_c, policy_r, nll_c, cfg: DPOLossConfig):
    """ORPO: chosen NLL + lambda * odds-ratio penalty (no reference model)."""
    log_odds = (policy_c - policy_r) - (
        jnp.log1p(-jnp.exp(jnp.minimum(policy_c, -1e-7)))
        - jnp.log1p(-jnp.exp(jnp.minimum(policy_r, -1e-7)))
    )
    ratio_loss = -jax.nn.log_sigmoid(log_odds)
    loss = nll_c.mean() + cfg.orpo_lambda * ratio_loss.mean()
    return loss, {"log_odds": log_odds.mean(), "chosen_nll": nll_c.mean()}


class PreferenceTokenizeFn:
    """{"chosen": [...messages], "rejected": [...]} -> two tokenized samples."""

    def __init__(self, tokenizer, chat_template: str = "qwen", max_length: int | None = None):
        self.inner = OpenaiSFTTokenizeFn(tokenizer, chat_template, max_length)

    def __call__(self, item: dict[str, Any]) -> dict:
        chosen = self.inner({"messages": item["chosen"]})
        rejected = self.inner({"messages": item["rejected"]})
        return {"chosen": chosen, "rejected": rejected,
                "num_tokens": chosen["num_tokens"] + rejected["num_tokens"]}

    def hash(self) -> str:
        return "pref-" + self.inner.hash()


class PreferenceTrainerConfig(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)
    model_cfg: Any
    data_path: str  # jsonl with {"chosen": [...], "rejected": [...]}
    loss_cfg: DPOLossConfig = DPOLossConfig()
    optim_cfg: OptimConfig = AdamWConfig(lr=5e-7)
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
    exp_name: str = "dpo"
    seed: int = 0

    def build(self) -> "PreferenceTrainer":
        return PreferenceTrainer(self)


class PreferenceTrainer:
    def __init__(self, cfg: PreferenceTrainerConfig):
        self.cfg = cfg
        self.work_dir = Path(cfg.work_dir) / cfg.exp_name
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.tokenizer = self._build_tokenizer()
        fn = PreferenceTokenizeFn(self.tokenizer, cfg.chat_template, cfg.max_length)
        self.dataset = JsonlDataset(cfg.data_path, fn)
        self.sampler = iter(ParallelSampler(len(self.dataset), seed=cfg.seed))
        steps_per_epoch = max(len(self.dataset) // cfg.pairs_per_step, 1)
        self.total_steps = cfg.total_steps or max(int(steps_per_epoch * cfg.epochs), 1)
        self.engine = TrainEngine(cfg.model_cfg, cfg.optim_cfg, cfg.lr_cfg, cfg.mesh_cfg,
                                  self.total_steps)
        if cfg.load_from:
            self.engine.from_hf(cfg.load_from)
        else:
            self.engine.init_random(cfg.seed)
        # frozen reference policy = initial weights (DPO only)
        self.ref_params = None
        if cfg.loss_cfg.loss_type == "dpo":
            self.ref_params = jax.tree.map(jax.lax.stop_gradient, self.engine.params)
        self.writer = JsonlWriter(self.work_dir)
        self._step_fn = None

    def _build_tokenizer(self):
        if self.cfg.tokenizer_path:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(self.cfg.tokenizer_path, trust_remote_code=True)
        from .toy_tokenizer import UTF8ByteTokenizer

        return UTF8ByteTokenizer()

    # ------------------------------------------------------------------
    def _next_batch(self) -> dict[str, np.ndarray]:
        """2*pairs rows: even = chosen, odd = rejected; one doc per row."""
        rows = []
        for _ in range(self.cfg.pairs_per_step):
            item = self.dataset[next(self.sampler)]
            rows.append([item["chosen"]])
            rows.append([item["rejected"]])
        batch = sft_llm_collator(rows, self.cfg.max_length)
        return {k: v[None] for k, v in batch.items()}  # (1, 2*pairs, L)

    def _loss_fn(self):
        model, sc, dtype = self.engine.model, self.engine.sc, self.engine.compute_dtype
        loss_cfg = self.cfg.loss_cfg
        chunk = self.cfg.model_cfg.lm_loss_cfg.chunk_size
        ref_params = self.ref_params

        def seq_logprobs(params, mb):
            seq_ctx = SequenceContext(input_ids=mb["input_ids"],
                                      segment_ids=mb["segment_ids"],
                                      position_ids=mb["position_ids"])
            hidden = model.forward(params, seq_ctx, sc=sc, compute_dtype=dtype)
            w = model.lm_head_weight(params).astype(dtype)
            lps = per_token_logprobs(hidden, w, mb["shifted_labels"], chunk)
            mask = (mb["shifted_labels"] != -100).astype(jnp.float32)
            total = jnp.sum(lps * mask, axis=-1)  # (B,) sequence logprob
            mean = total / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
            return total, mean

        def loss_fn(params, mb, denom):
            total, mean = seq_logprobs(params, mb)
            pc, pr = total[0::2], total[1::2]
            if loss_cfg.loss_type == "dpo":
                ref_total, _ = seq_logprobs(jax.tree.map(jax.lax.stop_gradient, ref_params), mb)
                rc, rr = ref_total[0::2], ref_total[1::2]
                return dpo_pair_loss(pc, pr, rc, rr, loss_cfg)
            # ORPO uses length-normalized logprobs + chosen NLL
            mc, mr = mean[0::2], mean[1::2]
            return orpo_pair_loss(mc, mr, -mc, loss_cfg)

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
            dt = time.time() - t0
            extra = (f"acc {metrics.get('reward_acc', 0):.3f} "
                     f"margin {metrics.get('reward_margin', 0):.4f}"
                     if self.cfg.loss_cfg.loss_type == "dpo" else
                     f"log_odds {metrics.get('log_odds', 0):.4f}")
            logger.info(
                f"{self.cfg.loss_cfg.loss_type.upper()} Step {step}/{self.total_steps} "
                f"loss {metrics['total_loss']:.4f} {extra} "
                f"grad_norm {metrics['grad_norm']:.3f} step {dt:.2f}s")
            self.writer.add_scalars(metrics, step)
        self.writer.close()
