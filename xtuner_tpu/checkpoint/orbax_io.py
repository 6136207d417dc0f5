"""Sharded checkpoint save/resume via Orbax.

Reference: the DCP layer (xtuner/v1/engine/train_engine.py:323-536 — sync/async
dcp.save, .incomplete commit-rename, shm-staged writer, gloo side channel) plus
the trainer's `.xtuner` meta bookkeeping (trainer.py:120-245,1251-1424).
Orbax subsumes the machinery: async array writes, atomic finalization, and
resharding-on-restore are built in; we keep the same layering (model state,
optimizer state, dataloader/meta json, max-keep GC).
"""

from __future__ import annotations

import json
import shutil
import threading
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..utils.logger import get_logger

logger = get_logger()


def _restore_sharded(path: Path, template):
    """Restore a pytree of arrays DIRECTLY onto each template leaf's
    sharding — each process reads only the byte ranges of its addressable
    shards (orbax `ArrayRestoreArgs(sharding=...)`), so restore is
    multihost-correct (non-fully-addressable meshes) and never materializes
    a full model-sized host buffer. This is the analog of the reference's
    resharding-capable distributed DCP load (ref
    xtuner/v1/engine/train_engine.py:478-536); the old implementation
    round-tripped every leaf through a full host ndarray + device_put,
    which breaks on multi-process meshes and host-OOMs at 235B.

    Dtype drift (saved dtype != template dtype) is cast — mixed-precision
    resume is legitimate — but logged loudly per leaf instead of silently
    (the reference handles frozen-param strictness explicitly)."""
    restorer = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())

    # saved-dtype strictness check against the checkpoint's metadata
    try:
        meta = restorer.metadata(path)
        mtree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
        flat_meta = {tuple(k): v for k, v in
                     jax.tree_util.tree_flatten_with_path(mtree)[0]} \
            if mtree is not None else {}
    except Exception:
        flat_meta = {}
    if flat_meta:
        for kpath, t in jax.tree_util.tree_flatten_with_path(template)[0]:
            m = flat_meta.get(tuple(kpath))
            saved_dt = getattr(m, "dtype", None)
            if (saved_dt is not None and hasattr(t, "dtype")
                    and saved_dt != t.dtype):
                logger.warning(
                    f"checkpoint dtype drift at {jax.tree_util.keystr(kpath)}: "
                    f"saved {saved_dt} -> restoring as {t.dtype}")

    def rarg(t):
        if hasattr(t, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=t.sharding,
                                        global_shape=t.shape, dtype=t.dtype)
        return ocp.RestoreArgs()

    args = jax.tree.map(rarg, template)
    return restorer.restore(path, item=template, restore_args=args)


class TrainCheckpointManager:
    def __init__(self, work_dir: str | Path, max_keep: Optional[int] = None,
                 async_save: bool = True):
        self.ckpt_dir = Path(work_dir).resolve() / "checkpoints"  # orbax requires absolute paths
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.max_keep = max_keep
        self.async_save = async_save
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()) if async_save \
            else ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        self._commit_thread: Optional[threading.Thread] = None

    def _step_dir(self, step: int) -> Path:
        return self.ckpt_dir / f"step-{step}"

    def list_steps(self) -> list[int]:
        steps = []
        for p in self.ckpt_dir.glob("step-*"):
            if (p / "train_state.json").exists():  # only committed checkpoints
                steps.append(int(p.name.split("-")[1]))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.list_steps()
        return steps[-1] if steps else None

    # ------------------------------------------------------------------
    def save(self, step: int, params, opt_state, train_state: dict[str, Any],
             dataloader_state: Optional[dict] = None) -> None:
        """Truly async: `AsyncCheckpointer.save` returns after the device->host
        snapshot; disk writes and the json commit markers happen on a
        background thread (the reference's daemon + .incomplete-rename commit,
        train_engine.py:360-442). At most one save is in flight — a new save
        first joins the previous commit. Crash mid-save leaves a dir WITHOUT
        train_state.json, which list_steps/resume ignore."""
        # join the previous commit thread (it already waited for its arrays;
        # AsyncCheckpointer.save serializes array writes internally)
        if self._commit_thread is not None:
            self._commit_thread.join()
            self._commit_thread = None
        step_dir = self._step_dir(step)
        self._ckptr.save(step_dir / "params", params, force=True)
        self._ckptr.save(step_dir / "opt_state", opt_state, force=True)

        def commit():
            # commit markers only after the arrays are durably on disk;
            # marker writes + GC are process-0-only in multihost (every
            # process participates in the orbax array save above, which is
            # collectively coordinated — the reference's gloo-side-channel
            # commit, ref train_engine.py:360-442)
            self._wait_arrays()
            if jax.process_index() != 0:
                return
            if dataloader_state is not None:
                (step_dir / "dataloader_state.json").write_text(json.dumps(dataloader_state))
            (step_dir / "train_state.json").write_text(json.dumps(train_state))
            logger.info(f"saved checkpoint step {step} -> {step_dir}")
            self._gc()

        if self.async_save:
            self._commit_thread = threading.Thread(
                target=commit, name=f"ckpt-commit-{step}", daemon=True)
            self._commit_thread.start()
        else:
            commit()
            if jax.process_count() > 1:
                # sync save promises "restorable on return" — barrier so no
                # process can race ahead of process 0's commit marker
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"xtuner-ckpt-{step}")

    def _gc(self) -> None:
        if self.max_keep is None:
            return
        steps = self.list_steps()
        for step in steps[: -self.max_keep]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)

    # ------------------------------------------------------------------
    def restore(self, step: int, params_template, opt_template, *,
                load_model: bool = True, load_optimizer: bool = True,
                load_dataset: bool = True):
        """Templates: concrete sharded pytrees (current params/opt_state);
        restored arrays are placed back onto each template leaf's sharding.

        Selective resume (reference arguments.py load_model/load_optimizer_states/
        load_dataset): a False flag keeps the caller's current state for that
        component (e.g. fresh optimizer over restored weights).
        """
        step_dir = self._step_dir(step)
        params = (_restore_sharded(step_dir / "params", params_template)
                  if load_model else params_template)
        opt_state = (_restore_sharded(step_dir / "opt_state", opt_template)
                     if load_optimizer else opt_template)
        train_state = json.loads((step_dir / "train_state.json").read_text())
        dl_path = step_dir / "dataloader_state.json"
        dataloader_state = (json.loads(dl_path.read_text())
                            if load_dataset and dl_path.exists() else None)
        return params, opt_state, train_state, dataloader_state

    def restore_params(self, step: int, params_template):
        """Model weights only (checkpoint-convert path)."""
        step_dir = self._step_dir(step)
        train_state = json.loads((step_dir / "train_state.json").read_text())
        return _restore_sharded(step_dir / "params", params_template), train_state

    def _wait_arrays(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def wait(self) -> None:
        """Block until the in-flight save (arrays AND commit markers) lands."""
        if self._commit_thread is not None:
            self._commit_thread.join()
            self._commit_thread = None
        self._wait_arrays()
