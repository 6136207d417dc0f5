"""GRPO RL CLI.

Reference: xtuner/v1/train/cli/rl.py (builds the RL trainer from a config
file). No Ray init — the TPU colocate trainer is single-controller:

    python -m xtuner_tpu.train.cli.rl --config examples/rl_tiny.py
"""

from __future__ import annotations

import argparse
from typing import Optional

from ...rl.trainer import RLTrainerConfig
from ...utils.config import Config


def main(argv: Optional[list[str]] = None) -> None:
    p = argparse.ArgumentParser(description="xtuner-tpu GRPO RL trainer")
    p.add_argument("--config", type=str, required=True,
                   help="python config file defining `trainer = RLTrainerConfig(...)`")
    args = p.parse_args(argv)
    cfg = Config.fromfile(args.config)["trainer"]
    if not isinstance(cfg, RLTrainerConfig):
        raise TypeError("config file must define `trainer = RLTrainerConfig(...)`")
    cfg.build().fit()


if __name__ == "__main__":
    main()
