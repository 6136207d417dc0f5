"""2-process jax.distributed CPU dryrun: utils/dist.py end-to-end.

Each process hosts one CPU device; together they form a 2-device global mesh
and run ONE full jitted MoE train step with fsdp=2 — exercising the
multihost bootstrap (utils/dist.maybe_init_distributed), cross-process
global-array construction (engine.put_batch's make_array_from_callback
path), and Gloo-backed collectives.

Run as the worker:  python tools/multihost_dryrun.py <process_id>
Run as the driver:  python tools/multihost_dryrun.py   (spawns both)
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("XT_MH_PORT", "19755"))


def worker(process_id: int) -> None:
    import jax
    import jax.extend.backend

    # this image's sitecustomize pre-creates the TPU/axon backend at
    # interpreter start; distributed init must come before any backend touch
    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    os.environ["XTUNER_COORDINATOR"] = f"127.0.0.1:{PORT}"
    os.environ["XTUNER_NUM_PROCESSES"] = "2"
    os.environ["XTUNER_PROCESS_ID"] = str(process_id)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from xtuner_tpu.utils.dist import is_main_process, maybe_init_distributed

    rank = maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

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
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK rank={rank} main={is_main_process()} loss={loss:.4f}",
          flush=True)


def driver() -> None:
    here = os.path.abspath(__file__)
    procs = [subprocess.Popen([sys.executable, here, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    ok = all("MULTIHOST_OK" in o for o in outs) and all(p.returncode == 0 for p in procs)
    for i, o in enumerate(outs):
        marker = [l for l in o.splitlines() if "MULTIHOST_OK" in l]
        print(f"proc {i}: {marker[0] if marker else o[-400:]}")
    if not ok:
        raise SystemExit("multihost dryrun FAILED")
    print("multihost_dryrun(2 processes) ok")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        driver()
