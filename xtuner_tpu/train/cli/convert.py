"""Checkpoint conversion (reference: legacy v0 tools/model_converters/ —
pth->HF convert/merge). Converts an orbax training checkpoint to an HF
safetensors export, optionally merging LoRA adapters.

    python -m xtuner_tpu.train.cli.convert --work-dir work_dirs/exp --model qwen3-0-6b --out hf_export
"""

from __future__ import annotations

import argparse
from typing import Optional


def main(argv: Optional[list[str]] = None) -> None:
    p = argparse.ArgumentParser(description="orbax checkpoint -> HF safetensors")
    p.add_argument("--work-dir", required=True, help="trainer work dir (contains checkpoints/)")
    p.add_argument("--model", required=True, help="registry name or HF dir for the architecture")
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=None, help="default: latest")
    args = p.parse_args(argv)

    import jax

    from ...checkpoint.hf import save_hf_checkpoint
    from ...checkpoint.orbax_io import TrainCheckpointManager
    from ...model.registry import get_model_config
    from ...module.params import init_params, param_shardings
    from ...parallel.mesh import MeshConfig, build_mesh
    from ...utils.logger import get_logger

    logger = get_logger()
    cfg = get_model_config(args.model)
    model = cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig()
    shardings = param_shardings(specs, build_mesh(mesh_cfg), mesh_cfg.rules())
    template = jax.jit(lambda r: init_params(specs, r), out_shardings=shardings)(jax.random.key(0))

    mgr = TrainCheckpointManager(args.work_dir, async_save=False)
    step = args.step or mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {args.work_dir}")
    params, train_state = mgr.restore_params(step, template)
    logger.info(f"restored step {step} (trained to {train_state})")
    params = model.merge_lora(params) if getattr(cfg, "lora_cfg", None) else params
    key_map = (cfg.model_copy(update={"lora_cfg": None}).build().hf_key_map()
               if getattr(cfg, "lora_cfg", None) else model.hf_key_map())
    save_hf_checkpoint(args.out, params, key_map, cfg)


if __name__ == "__main__":
    main()
