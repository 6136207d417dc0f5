"""Trainer: the SFT/pretrain driver.

Reference: xtuner/v1/train/trainer.py (Trainer/TrainerConfig :469/:393,
fit() :846-940). Same responsibilities — work-dir + experiment meta, tokenizer,
dataloader, engine, LR schedule, checkpoint/resume, per-step metrics
(lr/loss/grad_norm/tgs/eta), periodic save (ckpt + HF export) — with the
distributed-runtime pieces (torchrun, NUMA binding, device meshes per rank,
gc tuning) replaced by the single-controller JAX runtime.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from pydantic import BaseModel, ConfigDict

from ..config.optim import AdamWConfig, LRConfig, OptimConfig
from ..datasets.config import DataloaderConfig
from ..engine.train_engine import TrainEngine
from ..model.base import TransformerConfig
from ..parallel.mesh import MeshConfig
from ..utils.logger import get_logger, log_file_handler
from ..writer import JsonlWriter, TensorboardWriter

logger = get_logger()


class TrainerHook:
    """Hook protocol (reference: trainer.py:258-380 HookStage/HooksConfig —
    protocol-typed hook lists at train-step and save stages)."""

    def after_train_step(self, trainer: "Trainer", step: int, metrics: dict) -> None: ...

    def after_save_checkpoint(self, trainer: "Trainer", step: int) -> None: ...

    def after_save_hf(self, trainer: "Trainer", step: int, path: str) -> None: ...


def _git_state() -> dict:
    """Commit + dirty diff stat of the running code (reference XTunerMeta
    git capture, trainer.py:185-245); empty outside a git repo."""
    import subprocess

    def run(*args):
        try:
            return subprocess.run(["git", *args], capture_output=True, text=True,
                                  timeout=5, cwd=str(Path(__file__).resolve().parent)
                                  ).stdout.strip()
        except Exception:
            return ""

    commit = run("rev-parse", "HEAD")
    if not commit:
        return {}
    return {"commit": commit, "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
            "diff_stat": run("diff", "--stat")[-2000:]}


class TrainerConfig(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)
    model_cfg: Any  # TransformerConfig or ComposeConfig (VLM)
    dataloader_cfg: DataloaderConfig
    optim_cfg: OptimConfig = AdamWConfig()
    lr_cfg: LRConfig = LRConfig()
    mesh_cfg: MeshConfig = MeshConfig()
    # batch geometry: rows are packed sequences of pack_max_length tokens
    global_batch_rows: int = 8
    micro_batch_rows: int = 1
    total_steps: Optional[int] = None
    epochs: float = 1.0
    # io
    load_from: Optional[str] = None  # HF checkpoint dir
    tokenizer_path: Optional[str] = None  # None -> UTF8ByteTokenizer toy
    work_dir: str = "work_dirs"
    exp_name: str = "default"
    checkpoint_interval: Optional[int] = None  # steps; None = only at end
    checkpoint_max_keep: Optional[int] = 2
    # lightweight crash-recovery saves on a faster cadence than full
    # checkpoints (reference snapshot_interval, trainer.py:427)
    snapshot_interval: Optional[int] = None
    snapshot_max_keep: int = 1
    hf_interval: Optional[int] = None
    resume: bool = False
    # selective resume (reference arguments.py:load_model/load_optimizer_states/
    # load_dataset). load_scheduler has no analog: the LR schedule is a pure
    # function of the restored step.
    load_model: bool = True
    load_optimizer_states: bool = True
    load_dataset: bool = True
    log_interval: int = 1
    seed: int = 0
    exp_tracker: str = "jsonl"  # jsonl | tensorboard
    hooks: list[Any] = []  # TrainerHook instances
    profile_step: Optional[int] = None  # trace this step (reference profile_step)
    health_check_interval: Optional[int] = None
    # per-module activation stats every N steps (reference
    # InternalMetricsRecorder, utils/internal_metrics.py; retraces the step)
    act_stats_interval: Optional[int] = None
    # per-module NaN detection at every probe point (reference debug forward
    # hooks, trainer.py:1904-1926): scalar isfinite taps, cheap enough to
    # leave on for a whole run
    debug_nan_hooks: bool = False
    # host RSS + device HBM deltas logged per step (utils/track_rl_mem analog)
    track_memory: bool = False

    def build(self) -> "Trainer":
        return Trainer(self)


class Trainer:
    def __init__(self, cfg: TrainerConfig):
        from ..utils.dist import maybe_init_distributed

        maybe_init_distributed()
        self.cfg = cfg
        self.work_dir = Path(cfg.work_dir) / cfg.exp_name
        self.work_dir.mkdir(parents=True, exist_ok=True)
        log_file_handler(str(self.work_dir / "rank0.log"))
        self._write_meta()

        self.tokenizer = self._build_tokenizer()
        self._reconcile_config()
        self.dataloader = cfg.dataloader_cfg.build(
            self.tokenizer, cfg.global_batch_rows, cfg.micro_batch_rows
        )
        steps_per_epoch = len(self.dataloader)
        self.total_steps = cfg.total_steps or max(int(steps_per_epoch * cfg.epochs), 1)

        self.engine = TrainEngine(
            cfg.model_cfg, cfg.optim_cfg, cfg.lr_cfg, cfg.mesh_cfg, self.total_steps
        )
        import jax

        if (jax.process_count() > 1
                and getattr(self.dataloader, "local_b_rows", None) is None
                and cfg.dataloader_cfg.max_tiles == 0
                and cfg.dataloader_cfg.max_patches == 0):
            # multihost: each process tokenizes/collates only the micro-batch
            # rows its devices own; put_batch assembles the global array from
            # per-process blocks (reference per-rank sampler, sampler.py:28)
            self.dataloader.local_b_rows = self.engine.local_batch_row_ids(
                cfg.micro_batch_rows, cfg.dataloader_cfg.pack_max_length)
            logger.info(f"sharded data plane: this process materializes rows "
                        f"{self.dataloader.local_b_rows} of {cfg.micro_batch_rows}")
        logger.info(
            f"model: {self.engine.num_params/1e6:.1f}M params | mesh "
            f"{dict(zip(self.engine.mesh.axis_names, self.engine.mesh.devices.shape))} | "
            f"total_steps {self.total_steps}"
        )
        if cfg.load_from:
            self.engine.from_hf(cfg.load_from)
            logger.info(f"loaded HF checkpoint from {cfg.load_from}")
        else:
            self.engine.init_random(cfg.seed)

        from ..checkpoint.orbax_io import TrainCheckpointManager

        self.ckpt_mgr = TrainCheckpointManager(self.work_dir, cfg.checkpoint_max_keep)
        self._hf_export = None  # in-flight async HF export handle
        self.snapshot_mgr = None
        if cfg.snapshot_interval:
            self.snapshot_mgr = TrainCheckpointManager(
                self.work_dir / "snapshots", cfg.snapshot_max_keep)
        writer_cls = JsonlWriter if cfg.exp_tracker == "jsonl" else TensorboardWriter
        self.writer = writer_cls(self.work_dir)
        self.start_step = 0
        if cfg.resume:
            self._maybe_resume()

    # ------------------------------------------------------------------
    def _write_meta(self) -> None:
        """Experiment meta (.xtuner analog, trainer.py:120-245)."""
        meta_path = self.work_dir / "xtuner_meta.json"
        history = json.loads(meta_path.read_text()) if meta_path.exists() else {"exps": []}
        history["exps"].append({
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "config": json.loads(self.cfg.model_dump_json()) if hasattr(self, "cfg") else None,
            # reference trainer.py:185-245 records the repo state per exp
            "git": _git_state(),
        })
        meta_path.write_text(json.dumps(history, indent=1))

    def _build_tokenizer(self):
        if self.cfg.tokenizer_path:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(self.cfg.tokenizer_path, trust_remote_code=True)
        from .toy_tokenizer import UTF8ByteTokenizer

        logger.info("no tokenizer_path given; using UTF8ByteTokenizer toy tokenizer")
        return UTF8ByteTokenizer()

    def _reconcile_config(self) -> None:
        """Config conflict resolution (reference trainer.py:1946-2026).

        The reference additionally reconciles model_cfg.ep_size against
        fsdp_cfg.ep_size; here parallel sizes live ONLY in mesh_cfg, so that
        conflict cannot exist by construction.
        """
        cfg = self.cfg
        loss_red = cfg.model_cfg.lm_loss_cfg.loss_reduction
        if cfg.dataloader_cfg.loss_reduction != loss_red:
            cfg.dataloader_cfg.loss_reduction = loss_red

        # pad id: tokenizer pad -> eos -> 0 (reference :1953-1967)
        if cfg.dataloader_cfg.pad_token_id is None:
            pad = getattr(self.tokenizer, "pad_token_id", None)
            if pad is None:
                pad = getattr(self.tokenizer, "eos_token_id", None)
            if isinstance(pad, list):
                pad = pad[0]
            if not isinstance(pad, int):
                logger.warning(f"tokenizer pad_token_id is {pad!r}; using 0")
                pad = 0
            cfg.dataloader_cfg.pad_token_id = pad

        # sequence parallel needs fixed-length packed rows (reference :1996-2001)
        sp = cfg.mesh_cfg.sp_size
        if sp > 1 and cfg.dataloader_cfg.pack_level == "none":
            logger.warning("pack_level='none' is incompatible with sp>1; forcing 'soft'")
            cfg.dataloader_cfg.pack_level = "soft"
        if sp > 1 and cfg.dataloader_cfg.pack_max_length % sp != 0:
            raise ValueError(
                f"pack_max_length ({cfg.dataloader_cfg.pack_max_length}) must be "
                f"divisible by sp_size ({sp})")

    def _maybe_resume(self) -> None:
        latest = self.ckpt_mgr.latest_step()
        mgr = self.ckpt_mgr
        # a newer snapshot beats an older full checkpoint (auto_resume semantics)
        if self.snapshot_mgr is not None:
            snap = self.snapshot_mgr.latest_step()
            if snap is not None and (latest is None or snap > latest):
                latest, mgr = snap, self.snapshot_mgr
        if latest is None:
            logger.info("resume requested but no checkpoint found; starting fresh")
            return
        params, opt_state, train_state, dl_state = mgr.restore(
            latest, self.engine.params, self.engine.opt_state,
            load_model=self.cfg.load_model,
            load_optimizer=self.cfg.load_optimizer_states,
            load_dataset=self.cfg.load_dataset,
        )
        self.engine.params, self.engine.opt_state = params, opt_state
        self.start_step = train_state["step"]
        if dl_state is not None:
            self.dataloader.load_state_dict(dl_state)
        logger.info(f"resumed from checkpoint step {latest}")

    def _save(self, step: int) -> None:
        self.ckpt_mgr.save(
            step, self.engine.params, self.engine.opt_state,
            train_state={"step": step},
            dataloader_state=self.dataloader.get_state_dict(),
        )

    # ------------------------------------------------------------------
    def fit(self) -> None:
        cfg = self.cfg
        data_iter = iter(self.dataloader)
        n_chips = self.engine.mesh.devices.size
        consumed_tokens = 0
        t_start = time.time()

        profiler = None
        if cfg.profile_step is not None:
            from ..profiler.profile import StepProfiler

            profiler = StepProfiler(self.work_dir / "profile", cfg.profile_step)

        nan_watch = None
        if cfg.debug_nan_hooks:
            from ..profiler.prober import Prober

            # active at TRACE time so every probe point compiles in its
            # scalar isfinite tap; stays active the whole run
            nan_watch = Prober(self.work_dir / "nan_watch", nan_only=True)
            nan_watch.__enter__()
        mem_tracker = None
        if cfg.track_memory:
            from ..utils.mem_monitor import MemoryTracker

            mem_tracker = MemoryTracker()
            mem_tracker.mark("fit_start")

        for step in range(self.start_step + 1, self.total_steps + 1):
            t0 = time.time()
            if profiler is not None:
                profiler.maybe_start(step)
            batch = next(data_iter)
            t_data = time.time() - t0
            if cfg.act_stats_interval and step % cfg.act_stats_interval == 0:
                from ..profiler.internal_metrics import ActivationStatsRecorder

                # probe taps compile in only while a Prober is active: drop
                # the cached step fn so this step retraces WITH taps, and
                # again after so later steps go back to the tap-free trace
                rec = ActivationStatsRecorder(interval=cfg.act_stats_interval)
                self.engine._step_fn = None
                box = {}
                try:
                    rec.maybe_record(step, lambda: box.setdefault(
                        "m", self.engine.train_step(batch, step)))
                finally:
                    self.engine._step_fn = None
                metrics = box["m"]
                if rec.last:
                    self.writer.add_scalars(rec.last, step)
            else:
                metrics = self.engine.train_step(batch, step)
            metrics = {k: float(v) for k, v in metrics.items()}  # blocks on device
            step_time = time.time() - t0
            consumed_tokens += int(metrics["consumed_tokens"])
            # real consumed tokens, not the pack ceiling (reference logs true
            # token counts; ceiling-based tgs overstates throughput)
            tgs = metrics["consumed_tokens"] / step_time / n_chips
            eta = (self.total_steps - step) * step_time
            if step % cfg.log_interval == 0 or step == self.total_steps:
                logger.info(
                    f"Step {step}/{self.total_steps} lr {metrics['lr']:.3e} "
                    f"text_tokens {metrics['consumed_tokens']:.0f} "
                    f"reduced_llm_loss {metrics['reduced_llm_loss']:.4f} "
                    f"grad_norm {metrics['grad_norm']:.4f} "
                    f"tgs {tgs:.1f} data_time {t_data:.3f}s step_time {step_time:.3f}s "
                    f"eta {eta/60:.1f}min"
                )
                self.writer.add_scalars(
                    {**metrics, "tgs": tgs, "step_time": step_time, "data_time": t_data}, step
                )
            if profiler is not None:
                profiler.maybe_stop(step)
            if mem_tracker is not None:
                mem_tracker.mark(f"step_{step}")
            if nan_watch is not None and nan_watch.nan_points:
                logger.warning(f"step {step}: non-finite activations at "
                               f"{sorted(set(nan_watch.nan_points))}")
                nan_watch.nan_points.clear()
            for hook in cfg.hooks:
                hook.after_train_step(self, step, metrics)
            if cfg.health_check_interval and step % cfg.health_check_interval == 0:
                from ..utils.check_health import check_health

                check_health()
            if self.snapshot_mgr is not None and step % cfg.snapshot_interval == 0:
                self.snapshot_mgr.save(step, self.engine.params, self.engine.opt_state,
                                       train_state={"step": step},
                                       dataloader_state=self.dataloader.get_state_dict())
            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0 \
                    and step != self.total_steps:
                self._save(step)
                for hook in cfg.hooks:
                    hook.after_save_checkpoint(self, step)
            if cfg.hf_interval and step % cfg.hf_interval == 0:
                hf_path = str(self.work_dir / f"hf-step-{step}")
                # async export: snapshot to host, write in the background so
                # step N+1 isn't stalled by file IO (at most one in flight)
                if self._hf_export is not None:
                    self._hf_export.join()
                self._hf_export = self.engine.async_save_hf(hf_path)
                for hook in cfg.hooks:
                    hook.after_save_hf(self, step, hf_path)

        if nan_watch is not None:
            nan_watch.__exit__()
        self._save(self.total_steps)
        if self._hf_export is not None:
            self._hf_export.join()
        self.ckpt_mgr.wait()
        if self.snapshot_mgr is not None:
            self.snapshot_mgr.wait()
        total_time = time.time() - t_start
        logger.info(
            f"training done: {self.total_steps - self.start_step} steps, "
            f"{consumed_tokens} tokens, {total_time/60:.1f} min"
        )
        if hasattr(self.writer, "close"):
            self.writer.close()
