"""Disaggregated RL trainer: rollout plane separated from the train plane.

Reference: xtuner/v1/train/rl_trainer.py (RLDisaggregatedTrainer :1808 —
distinct train/rollout placement groups, background async producer feeding
the replay buffer, consumer pulls batches, NCCL weight transport,
pause -> update_weights -> continue_produce cycle). TPU redesign:

- the rollout plane is a `RolloutWorker` HTTP server (own params copy, own
  devices in a real deployment) registered in a `WorkerRegistry` probed by a
  `HealthManager`;
- an `AsyncProducer` thread drives rollouts through the OpenAI-ish wire into
  the staleness-aware ReplayBuffer while the trainer consumes batches;
- weight sync is a `FilesystemTransport` snapshot (host-memory plane — the
  TPU has no NCCL outside jit) or `ColocateTransport` reference swap:
  pause producer -> publish -> worker /update_weights -> resume(version);
- every consumed batch is persisted by `RolloutTraceStore`.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.generate import GenerateConfig
from ..utils.logger import get_logger
from .advantage import compute_advantage
from .health_manager import HealthManager, WorkerRegistry
from .producer import AsyncProducer
from .replay_buffer import SampleGroup
from .rollout_client import RolloutClient, RolloutClientConfig
from .trace import RolloutTraceStore
from .trainer import RLColocateTrainer, RLTrainerConfig
from .transport import ColocateTransport, FilesystemTransport, ParamStore
from .worker import RolloutWorker

logger = get_logger()


class RLDisaggregatedTrainerConfig(RLTrainerConfig):
    transport: Literal["filesystem", "colocate"] = "filesystem"
    health_interval: float = 2.0
    rollout_timeout: float = 600.0
    trace_rollouts: bool = True

    def build(self) -> "RLDisaggregatedTrainer":
        return RLDisaggregatedTrainer(self)


class RLDisaggregatedTrainer(RLColocateTrainer):
    cfg: RLDisaggregatedTrainerConfig

    def __init__(self, cfg: RLDisaggregatedTrainerConfig):
        super().__init__(cfg)
        # --- rollout plane ---
        store = ParamStore()
        if cfg.transport == "colocate":
            self.transport = ColocateTransport(store)
        else:
            self.transport = FilesystemTransport(self.work_dir / "weight_sync")
        self.transport.publish(self.engine.params, 0)
        if cfg.transport == "colocate":
            worker_store = store
        else:
            worker_store = ParamStore()
        self.worker = RolloutWorker(
            cfg.model_cfg, tokenizer=self.tokenizer, gen_cfg=cfg.gen_cfg,
            compute_dtype=self.engine.compute_dtype, pad_token_id=self.pad_id,
            param_store=worker_store)
        if cfg.transport == "filesystem":
            # seed the worker with version-0 weights through the REAL path
            params0, v0 = self.transport.fetch(jax.tree.structure(self.engine.params))
            worker_store.set(params0, v0)
        url = self.worker.start()
        self.registry = WorkerRegistry()
        self.registry.register(url)
        self.health = HealthManager(self.registry, interval=cfg.health_interval)
        self.health.start()
        self.client = RolloutClient(RolloutClientConfig(base_url=url))
        self.trace_store = RolloutTraceStore(self.work_dir, enabled=cfg.trace_rollouts)
        self.producer = AsyncProducer(self._produce_remote, self.replay_buffer)

    # ------------------------------------------------------------------
    def _produce_remote(self, policy_version: int) -> list[SampleGroup]:
        """One producer iteration: every prompt group rolled out through the
        rollout plane's HTTP surface in a single request."""
        cfg = self.cfg
        idxs = self.rng.choice(len(self.prompts), cfg.prompts_per_step, replace=False)
        items = [self.prompts[int(pi)] for pi in idxs]
        prompts = [self._encode_prompt(item) for item in items]
        g = cfg.group_size
        worker = self.registry.route()
        resp = self.client._post_url(worker.url, "/v1/completions", {
            "prompt_ids": prompts, "n": g,
            "max_tokens": cfg.gen_cfg.max_new_tokens,
            "temperature": cfg.gen_cfg.temperature,
            "top_p": cfg.gen_cfg.top_p, "logprobs": True,
        })
        version = int(resp.get("policy_version", policy_version))
        groups = []
        for i, (pi, item, prompt) in enumerate(zip(idxs, items, prompts)):
            samples, rewards = [], []
            for gi in range(g):
                choice = resp["choices"][i * g + gi]
                toks = choice["token_ids"]
                text = choice.get("text") or self.tokenizer.decode(toks)
                reward = self.judger.judge(text, item.get("label") or item.get("answer"))
                rewards.append(reward)
                samples.append({
                    "prompt_ids": prompt,
                    "response_ids": toks,
                    "logprobs": (choice.get("logprobs") or {}).get(
                        "token_logprobs", [0.0] * len(toks)),
                    "reward": reward,
                })
            advs = compute_advantage(np.asarray(rewards), cfg.advantage)
            for s, a in zip(samples, advs):
                s["advantage"] = float(a)
            groups.append(SampleGroup(prompt_id=int(pi), samples=samples,
                                      policy_version=version,
                                      meta={"mean_reward": float(np.mean(rewards))}))
        return groups

    # ------------------------------------------------------------------
    def sync_weights(self, step: int) -> None:
        """pause producer -> publish -> worker reload -> resume (reference
        bind_train_rollout + update_weights cycle)."""
        self.producer.pause()
        info = self.transport.publish(self.engine.params, step)
        if self.cfg.transport == "filesystem":
            self.worker.update_weights(path=str(self.transport.root))
        else:
            self.worker.update_weights(version=step)
        self.producer.resume(step)
        logger.info(f"weight sync -> rollout plane at version {step} ({info})")

    def shutdown(self) -> None:
        self.producer.stop()
        self.health.stop()
        self.worker.stop()

    # ------------------------------------------------------------------
    def fit(self) -> None:
        cfg = self.cfg
        self.producer.start()
        try:
            for step in range(1, cfg.total_steps + 1):
                t0 = time.time()
                train_groups = self.producer.get_batch(
                    cfg.prompts_per_step, current_step=step,
                    timeout=cfg.rollout_timeout)
                t_roll = time.time() - t0
                self.trace_store.record(step, train_groups, tokenizer=self.tokenizer)
                batch = self._pack(train_groups)
                if self.ref_params is not None:
                    batch["ref_logprobs"] = self._compute_ref_logprobs(batch)
                if self._step_fn is None:
                    self._step_fn = self.engine._build_step_fn(self._rl_loss_fn())
                device_batch = self.engine.put_batch(batch)
                self.engine.params, self.engine.opt_state, metrics = self._step_fn(
                    self.engine.params, self.engine.opt_state,
                    jnp.asarray(step, jnp.int32), device_batch)
                metrics = {k: float(v) for k, v in metrics.items()}
                mean_reward = float(np.mean([g.meta["mean_reward"] for g in train_groups]))
                staleness = float(np.mean([step - g.policy_version for g in train_groups]))
                self.sync_weights(step)
                logger.info(
                    f"RL-disagg Step {step}/{cfg.total_steps} reward {mean_reward:.3f} "
                    f"pg_loss {metrics['pg_loss']:.4f} staleness {staleness:.1f} "
                    f"rollout_wait {t_roll:.1f}s step {time.time() - t0:.1f}s")
                self.writer.add_scalars({**metrics, "mean_reward": mean_reward,
                                         "staleness": staleness,
                                         "rollout_wait": t_roll}, step)
        finally:
            self.shutdown()
            self.writer.close()
