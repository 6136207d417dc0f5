"""2-process jax.distributed CPU dryrun: utils/dist.py end-to-end.

Each process hosts one CPU device; together they form a 2-device global mesh
and run ONE full jitted MoE train step with fsdp=2 — exercising the
multihost bootstrap (utils/dist.maybe_init_distributed), cross-process
global-array construction (engine.put_batch's make_array_from_callback
path), and Gloo-backed collectives. Then the step's state is saved with the
orbax layer, restored SHARDED onto the same 2-process mesh (no host
full-array round trip, checkpoint/orbax_io.py), one more step runs from the
restored state, and a multihost-safe HF export (checkpoint/hf.py save_hf)
writes safetensors from process 0 — the reference's DCP + HF-export
discipline (ref xtuner/v1/engine/train_engine.py:478-536,
xtuner/v1/model/base.py:1902-2029).

Run as the worker:  python tools/multihost_dryrun.py <process_id> <port>
Run as the driver:  python tools/multihost_dryrun.py   (spawns both)
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scrub_device_count_env(env: dict) -> dict:
    """Drop every inherited device-count override. The driver harness (and
    the test conftest) export XLA_FLAGS=--xla_force_host_platform_device_count
    =N; a worker inheriting that hosts N CPU devices instead of 1, so the
    2-process mesh sees 2*N global devices (the r1/r3/r4 gate failure)."""
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env = dict(env)
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def worker(process_id: int, port: int) -> None:
    # the env scrub must happen before ANY backend touch in this process too:
    # the clear_backends() below re-reads XLA_FLAGS on backend re-creation
    os.environ.update(_scrub_device_count_env(dict(os.environ)))

    import jax
    import jax.extend.backend

    # this image's sitecustomize pre-creates the TPU/axon backend at
    # interpreter start; distributed init must come before any backend touch
    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    os.environ["XTUNER_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["XTUNER_NUM_PROCESSES"] = "2"
    os.environ["XTUNER_PROCESS_ID"] = str(process_id)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from xtuner_tpu.utils.dist import is_main_process, maybe_init_distributed

    rank = maybe_init_distributed()
    assert jax.process_count() == 2, (
        f"expected 2 jax processes after distributed init, got "
        f"{jax.process_count()} (rank={rank}, coordinator port {port})")
    assert len(jax.devices()) == 2, (
        f"expected 2 global devices, got {len(jax.devices())}")
    assert len(jax.local_devices()) == 1, (
        f"expected 1 local device per process, got {len(jax.local_devices())}")

    import numpy as np

    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.datasets.collator import fake_collator
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.moe import MoEConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.parallel.mesh import MeshConfig

    cfg = MoEConfig(
        vocab_size=512, num_hidden_layers=2, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=128, n_routed_experts=4, num_experts_per_tok=2,
        balancing_loss_coef=0.01,
        attention=MHAConfig(num_attention_heads=8, num_key_value_heads=4, head_dim=16),
        lm_loss_cfg=CELossConfig(chunk_size=256),
    )
    engine = TrainEngine(cfg, AdamWConfig(lr=1e-4), LRConfig(warmup_steps=1),
                         MeshConfig(fsdp_size=2, param_dtype="float32"), total_steps=5)
    engine.init_random(0)
    flat = fake_collator(2, 256, cfg.vocab_size, seed=0)
    batch = {k: v.reshape(1, 2, 256) for k, v in flat.items()}
    metrics = engine.train_step(batch, step=1)
    loss = float(metrics["reduced_llm_loss"])
    assert np.isfinite(loss), f"non-finite step-1 loss {loss}"

    # ---- sharded checkpoint round trip across BOTH processes (save →
    # restore-to-NamedSharding → one more step from the restored state) ----
    ckpt_dir = os.environ.get("XT_MH_CKPT")
    if ckpt_dir:
        from xtuner_tpu.checkpoint.orbax_io import TrainCheckpointManager

        mgr = TrainCheckpointManager(ckpt_dir, async_save=False)
        mgr.save(1, engine.params, engine.opt_state, {"step": 1})
        restored_params, restored_opt, train_state, _ = mgr.restore(
            1, engine.params, engine.opt_state)
        assert train_state["step"] == 1, train_state
        # restored leaves keep their sharding and only local shards are
        # addressable per process — no full-host materialization happened
        leaf = jax.tree_util.tree_leaves(restored_params)[0]
        assert leaf.sharding == jax.tree_util.tree_leaves(
            engine.params)[0].sharding, "restore dropped the NamedSharding"
        engine.params, engine.opt_state = restored_params, restored_opt
        metrics2 = engine.train_step(batch, step=2)
        loss2 = float(metrics2["reduced_llm_loss"])
        assert np.isfinite(loss2), f"non-finite post-restore loss {loss2}"

        # ---- multihost-safe HF export: every process participates in the
        # gather, process 0 writes safetensors ----
        hf_dir = os.path.join(ckpt_dir, "hf")
        engine.save_hf(hf_dir)
        if is_main_process():
            import glob

            files = glob.glob(os.path.join(hf_dir, "*.safetensors"))
            assert files, f"save_hf wrote no safetensors under {hf_dir}"

    # ---- sharded data plane: each process tokenizes/collates ONLY the rows
    # its devices own, yet the assembled global batch (and loss) is bitwise
    # identical to full materialization (reference per-rank sampler,
    # xtuner/v1/datasets/sampler.py:28) ----
    from xtuner_tpu.datasets.dataloader import Dataloader
    from xtuner_tpu.datasets.sampler import ParallelSampler

    class ToyPacked:
        """Deterministic pack source that counts materializations."""

        def __init__(self):
            self.fetches = 0

        def __len__(self):
            return 8

        def __getitem__(self, i):
            self.fetches += 1
            rng = np.random.default_rng(100 + i)
            ids = rng.integers(1, 500, 200).tolist()
            return [{"input_ids": ids, "labels": ids}]

    local_rows = engine.local_batch_row_ids(2, 256)
    assert len(local_rows) == 1, (
        f"fsdp=2 over 2 processes: each process must own exactly 1 of 2 "
        f"micro-batch rows, got {local_rows}")
    ds_local, ds_full = ToyPacked(), ToyPacked()
    dl_local = Dataloader(ds_local, ParallelSampler(8, shuffle=False), 256,
                          global_batch_rows=2, micro_batch_rows=2,
                          local_b_rows=local_rows)
    dl_full = Dataloader(ds_full, ParallelSampler(8, shuffle=False), 256,
                         global_batch_rows=2, micro_batch_rows=2)
    b_local = next(iter(dl_local))
    b_full = next(iter(dl_full))
    assert ds_full.fetches == 2 and ds_local.fetches == 1, (
        f"sharded loader must materialize ONLY local rows "
        f"(local={ds_local.fetches}, full={ds_full.fetches})")
    # same sampler state after one batch (resume stays rank-identical)
    assert dl_local.get_state_dict() == dl_full.get_state_dict()
    ce_local = float(engine.forward_only(b_local).sum_ce)
    ce_full = float(engine.forward_only(b_full).sum_ce)
    assert abs(ce_local - ce_full) < 1e-6, (ce_local, ce_full)

    print(f"MULTIHOST_OK rank={rank} main={is_main_process()} loss={loss:.4f} "
          f"sharded_dataplane_ce={ce_local:.4f}",
          flush=True)


def driver() -> None:
    here = os.path.abspath(__file__)

    def attempt() -> tuple[bool, list[str]]:
        import tempfile

        port = int(os.environ.get("XT_MH_PORT", 0)) or _free_port()
        env = _scrub_device_count_env(dict(os.environ))
        with tempfile.TemporaryDirectory(prefix="xt_mh_ckpt_") as ckpt:
            env["XT_MH_CKPT"] = os.path.join(ckpt, "step")
            procs = [subprocess.Popen([sys.executable, here, str(i), str(port)],
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True,
                                      env=env)
                     for i in range(2)]
            outs = []
            for p in procs:
                try:
                    out, _ = p.communicate(timeout=420)
                except subprocess.TimeoutExpired:
                    p.kill()
                    out, _ = p.communicate()
                    out += "\n<driver: worker timed out after 420s>"
                outs.append(out)
        ok = (all("MULTIHOST_OK" in o for o in outs)
              and all(p.returncode == 0 for p in procs))
        return ok, outs

    ok, outs = attempt()
    if not ok:
        print("multihost dryrun attempt 1 failed; full worker output:")
        for i, o in enumerate(outs):
            print(f"----- proc {i} (attempt 1) -----\n{o}")
        ok, outs = attempt()  # retry once (port/bootstrap races are transient)
    for i, o in enumerate(outs):
        marker = [l for l in o.splitlines() if "MULTIHOST_OK" in l]
        if marker:
            print(f"proc {i}: {marker[0]}")
        else:
            print(f"----- proc {i} FAILED; full output -----\n{o}")
    if not ok:
        raise SystemExit("multihost dryrun FAILED")
    print("multihost_dryrun(2 processes) ok: step + sharded save/restore + "
          "step + HF export")


if __name__ == "__main__":
    if len(sys.argv) > 2:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    elif len(sys.argv) > 1:
        worker(int(sys.argv[1]), int(os.environ.get("XT_MH_PORT", "19755")))
    else:
        driver()
