"""`xtuner-tpu <mode>` dispatcher (reference: xtuner/entry_point.py mode
dispatcher — train/chat/convert/list-cfg...). No torchrun wrapping: JAX is
single-controller; multihost launch is `python` on every host."""

from __future__ import annotations

import sys

MODES = {
    "train": "xtuner_tpu.train.cli.sft",
    "sft": "xtuner_tpu.train.cli.sft",
    "rl": "xtuner_tpu.train.cli.rl",
    "chat": "xtuner_tpu.train.cli.chat",
    "serve": "xtuner_tpu.train.cli.serve",
    "convert": "xtuner_tpu.train.cli.convert",
    "mmbench": "xtuner_tpu.train.cli.mmbench",
    "eval-refcoco": "xtuner_tpu.train.cli.eval_refcoco",
    "eval_refcoco": "xtuner_tpu.train.cli.eval_refcoco",
    "preprocess": "xtuner_tpu.train.cli.preprocess",
}
# dataset/config inspection modes (reference legacy entry_point.py surface)
TOOL_MODES = {
    "log-dataset": "log_dataset",
    "check-custom-dataset": "check_custom_dataset",
    "list-cfg": "list_cfg",
    "copy-cfg": "copy_cfg",
}

HELP = """usage: xtuner-tpu <mode> [args]
modes:
  train | sft     supervised fine-tuning / pretraining (see --help)
  rl              GRPO reinforcement learning
  chat            interactive chat REPL against an HF checkpoint
  serve           OpenAI-compatible inference server (paged engine)
  convert         orbax training checkpoint -> HF safetensors export
  mmbench         MMBench VLM evaluation over a TSV benchmark
  eval-refcoco    RefCOCO referring-expression IoU@0.5 evaluation
  preprocess      dataset converters (alpaca/sharegpt/arxiv/refcoco) + count
  log-dataset     print tokenized samples with their loss masks
  check-custom-dataset  validate a jsonl dataset's schema
  list-cfg        list bundled example configs
  copy-cfg        copy a bundled example config into a directory
"""


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(HELP)
        return
    mode = sys.argv[1]
    if mode in TOOL_MODES:
        from xtuner_tpu.train.cli import dataset_tools

        getattr(dataset_tools, TOOL_MODES[mode])(sys.argv[2:])
        return
    if mode not in MODES:
        print(f"unknown mode {mode!r}\n{HELP}", file=sys.stderr)
        sys.exit(2)
    import importlib

    module = importlib.import_module(MODES[mode])
    module.main(sys.argv[2:])


if __name__ == "__main__":
    main()
