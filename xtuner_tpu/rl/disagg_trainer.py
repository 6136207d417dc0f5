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

import threading
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
    transport: Literal["filesystem", "colocate", "shm"] = "filesystem"
    health_interval: float = 2.0
    rollout_timeout: float = 600.0
    trace_rollouts: bool = True
    # rollout-plane scale + resilience (reference health_manager.py:105-214
    # restart_inactive_workers + worker reinit :597)
    num_rollout_workers: int = 1
    restart_dead_workers: bool = True
    max_worker_restarts: int = 3

    def build(self) -> "RLDisaggregatedTrainer":
        return RLDisaggregatedTrainer(self)


class RLDisaggregatedTrainer(RLColocateTrainer):
    cfg: RLDisaggregatedTrainerConfig

    def __init__(self, cfg: RLDisaggregatedTrainerConfig):
        super().__init__(cfg)
        # --- rollout plane ---
        self._store = ParamStore()
        if cfg.transport == "colocate":
            self.transport = ColocateTransport(self._store)
        elif cfg.transport == "shm":
            from .transport import SharedMemoryTransport

            # same-host zero-copy handover (CUDA-IPC analog): segments live
            # on tmpfs, not the (possibly networked) work_dir
            self.transport = SharedMemoryTransport(
                Path("/dev/shm") / f"xt_ws_{self.work_dir.name}")
        else:
            self.transport = FilesystemTransport(self.work_dir / "weight_sync")
        self.transport.publish(self.engine.params, 0)
        self._treedef = jax.tree.structure(self.engine.params)
        self.workers: dict[str, RolloutWorker] = {}
        self._workers_lock = threading.Lock()
        self._restarts = 0
        self.registry = WorkerRegistry()
        for _ in range(max(1, cfg.num_rollout_workers)):
            self._spawn_worker()
        self.health = HealthManager(self.registry, interval=cfg.health_interval,
                                    on_dead=self._on_worker_dead)
        self.health.start()
        self.client = RolloutClient(RolloutClientConfig(
            base_url=next(iter(self.workers))))
        self.trace_store = RolloutTraceStore(self.work_dir, enabled=cfg.trace_rollouts)
        from .spans import configure_spans

        self.spans = configure_spans(self.work_dir)  # rl_spans.jsonl
        self.producer = AsyncProducer(self._produce_remote, self.replay_buffer)

    # ------------------------------------------------------------------
    @property
    def worker(self) -> RolloutWorker:
        """First live worker (single-worker-era accessor)."""
        with self._workers_lock:
            return next(iter(self.workers.values()))

    def _spawn_worker(self) -> str:
        """Create + start one RolloutWorker seeded at the latest published
        weights (used at init AND by dead-worker restart)."""
        cfg = self.cfg
        if cfg.transport == "colocate":
            worker_store = self._store  # shared reference swap
        else:
            worker_store = ParamStore()
            params, ver = self.transport.fetch(self._treedef)
            worker_store.set(params, ver)
        worker = RolloutWorker(
            cfg.model_cfg, tokenizer=self.tokenizer, gen_cfg=cfg.gen_cfg,
            compute_dtype=self.engine.compute_dtype, pad_token_id=self.pad_id,
            param_store=worker_store)
        url = worker.start()
        with self._workers_lock:
            self.workers[url] = worker
        self.registry.register(url)
        return url

    def _on_worker_dead(self, state) -> None:
        """Health-manager callback: replace a dead worker with a fresh one
        reseeded through the transport (the restart_inactive_workers analog).
        Runs on the health thread."""
        with self._workers_lock:
            old = self.workers.pop(state.url, None)
        self.registry.unregister(state.url)
        if old is not None:
            try:
                old.stop()
            except Exception:
                pass
        if not self.cfg.restart_dead_workers or self._restarts >= self.cfg.max_worker_restarts:
            logger.warning(f"rollout worker {state.url} NOT restarted "
                           f"(restarts={self._restarts})")
            return
        self._restarts += 1
        url = self._spawn_worker()
        logger.info(f"rollout worker {state.url} restarted as {url} "
                    f"({self._restarts}/{self.cfg.max_worker_restarts})")

    # ------------------------------------------------------------------
    def _produce_remote(self, policy_version: int) -> list[SampleGroup]:
        """One producer iteration: every prompt group rolled out through the
        rollout plane's HTTP surface in a single request."""
        cfg = self.cfg
        idxs = self.rng.choice(len(self.prompts), cfg.prompts_per_step, replace=False)
        items = [self.prompts[int(pi)] for pi in idxs]
        prompts = [self._encode_prompt(item) for item in items]
        g = cfg.group_size
        payload = {
            "prompt_ids": prompts, "n": g,
            "max_tokens": cfg.gen_cfg.max_new_tokens,
            "temperature": cfg.gen_cfg.temperature,
            "top_p": cfg.gen_cfg.top_p, "logprobs": True,
        }
        # route with failover: a worker that errors mid-request is marked
        # not-alive immediately (the health thread later confirms + restarts)
        resp = None
        last_err: Exception | None = None
        for _ in range(max(1, len(self.registry.live()))):
            worker = self.registry.route()
            try:
                resp = self.client._post_url(worker.url, "/v1/completions", payload)
                break
            except Exception as e:  # connection refused / 5xx / timeout
                last_err = e
                worker.alive = False
                logger.warning(f"rollout request to {worker.url} failed ({e!r}); "
                               f"rerouting")
        if resp is None:
            raise RuntimeError(f"all rollout workers failed: {last_err!r}")
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
        """pause producer -> publish -> every worker reloads -> resume
        (reference bind_train_rollout + update_weights cycle)."""
        self.producer.pause()
        info = self.transport.publish(self.engine.params, step)
        with self._workers_lock:
            workers = list(self.workers.values())
        for worker in workers:
            try:
                if self.cfg.transport in ("filesystem", "shm"):
                    worker.update_weights(path=str(self.transport.root))
                else:
                    worker.update_weights(version=step)
            except Exception as e:  # a dying worker must not stall training
                logger.warning(f"weight sync to {worker.base_url} failed: {e!r}")
        self.producer.resume(step)
        logger.info(f"weight sync -> rollout plane ({len(workers)} workers) "
                    f"at version {step} ({info})")

    def shutdown(self) -> None:
        self.producer.stop()
        self.health.stop()
        with self._workers_lock:
            workers = list(self.workers.values())
        for worker in workers:
            worker.stop()

    # ------------------------------------------------------------------
    def fit(self) -> None:
        cfg = self.cfg
        self.producer.start()
        try:
            for step in range(1, cfg.total_steps + 1):
                t0 = time.time()
                with self.spans.span("rollout.wait", step=step):
                    train_groups = self.producer.get_batch(
                        cfg.prompts_per_step, current_step=step,
                        timeout=cfg.rollout_timeout)
                t_roll = time.time() - t0
                self.trace_store.record(step, train_groups, tokenizer=self.tokenizer)
                with self.spans.span("train.pack", step=step):
                    batch = self._pack(train_groups)
                    self._maybe_add_rollout_is_inputs(batch)
                if self.ref_params is not None:
                    with self.spans.span("train.ref_logprobs", step=step):
                        batch["ref_logprobs"] = self._compute_ref_logprobs(batch)
                if self._step_fn is None:
                    self._step_fn = self.engine._build_step_fn(self._rl_loss_fn())
                with self.spans.span("train.step", step=step):
                    device_batch = self.engine.put_batch(batch)
                    self.engine.params, self.engine.opt_state, metrics = self._step_fn(
                        self.engine.params, self.engine.opt_state,
                        jnp.asarray(step, jnp.int32), device_batch)
                    metrics = {k: float(v) for k, v in metrics.items()}
                mean_reward = float(np.mean([g.meta["mean_reward"] for g in train_groups]))
                staleness = float(np.mean([step - g.policy_version for g in train_groups]))
                with self.spans.span("train.weight_sync", step=step):
                    self.sync_weights(step)
                logger.info(
                    f"RL-disagg Step {step}/{cfg.total_steps} reward {mean_reward:.3f} "
                    f"pg_loss {metrics['pg_loss']:.4f} staleness {staleness:.1f} "
                    f"rollout_wait {t_roll:.1f}s step {time.time() - t0:.1f}s")
                self.writer.add_scalars({**metrics, "mean_reward": mean_reward,
                                         "staleness": staleness,
                                         "rollout_wait": t_roll}, step)
        finally:
            summary = self.spans.summary()
            if summary:
                imb = self.spans.imbalance()
                logger.info(f"RL span summary (rollout/train imbalance "
                            f"{imb if imb is None else round(imb, 2)}): "
                            + ", ".join(f"{k} {v['total_s']:.1f}s/{v['count']}"
                                        for k, v in sorted(summary.items())))
            self.shutdown()
            self.writer.close()
