"""Dataset/config inspection modes.

Reference: xtuner/entry_point.py legacy modes — `log-dataset` (print
tokenized samples with loss masks), `check-custom-dataset` (schema
validation), `list-cfg` / `copy-cfg` (preset config management).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path
from typing import Optional

EXAMPLES_DIR = Path(__file__).resolve().parents[3] / "examples"


def _build_tokenizer(tokenizer_path: Optional[str]):
    if tokenizer_path:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(tokenizer_path, trust_remote_code=True)
    from ..toy_tokenizer import UTF8ByteTokenizer

    return UTF8ByteTokenizer()


def log_dataset(argv: list[str]) -> None:
    p = argparse.ArgumentParser(prog="log-dataset")
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataset-type", default="openai_sft",
                   choices=["openai_sft", "pretrain", "ftdp"])
    p.add_argument("--chat-template", default="qwen")
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--num-samples", type=int, default=4)
    args = p.parse_args(argv)

    from ...datasets.jsonl import JsonlDataset
    from ...datasets.tokenize_fns import OpenaiSFTTokenizeFn, PretrainTokenizeFn

    tok = _build_tokenizer(args.tokenizer_path)
    if args.dataset_type == "ftdp":
        from ...datasets.ftdp import FtdpTokenizeFn

        fn = FtdpTokenizeFn(tok, "internlm2")
    elif args.dataset_type == "pretrain":
        fn = PretrainTokenizeFn(tok)
    else:
        fn = OpenaiSFTTokenizeFn(tok, args.chat_template)
    ds = JsonlDataset(args.dataset, fn, num_proc=1)
    n = min(args.num_samples, len(ds))
    for i in range(n):
        s = ds[i]
        ids, labels = list(s["input_ids"]), list(s["labels"])
        sup = [t for t, l in zip(ids, labels) if l != -100]
        print(f"===== sample {i} ({s['num_tokens']} tokens, "
              f"{len(sup)} supervised) =====")
        print("[full]", tok.decode(ids)[:2000])
        print("[supervised]", tok.decode(sup)[:2000])


def check_custom_dataset(argv: list[str]) -> None:
    p = argparse.ArgumentParser(prog="check-custom-dataset")
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataset-type", default="openai_sft", choices=["openai_sft", "pretrain"])
    args = p.parse_args(argv)

    bad = 0
    total = 0
    for ln, line in enumerate(Path(args.dataset).read_text().splitlines(), 1):
        if not line.strip():
            continue
        total += 1
        try:
            item = json.loads(line)
        except json.JSONDecodeError as e:
            print(f"line {ln}: invalid json ({e})")
            bad += 1
            continue
        if args.dataset_type == "pretrain":
            if not isinstance(item.get("text") or item.get("content"), str):
                print(f"line {ln}: pretrain items need a string 'text'/'content'")
                bad += 1
            continue
        msgs = item.get("messages")
        if not isinstance(msgs, list) or not msgs:
            print(f"line {ln}: missing 'messages' list")
            bad += 1
            continue
        roles = [m.get("role") for m in msgs]
        if not any(r == "assistant" for r in roles):
            print(f"line {ln}: no assistant turn (nothing to supervise)")
            bad += 1
        for mi, m in enumerate(msgs):
            if m.get("role") not in ("system", "developer", "user", "assistant", "tool"):
                print(f"line {ln}: message {mi} has unknown role {m.get('role')!r}")
                bad += 1
            content = m.get("content")
            ok_content = isinstance(content, (str, list)) or (
                content is None and m.get("tool_calls"))
            if not ok_content:
                print(f"line {ln}: message {mi} content must be str/list")
                bad += 1
    status = "OK" if bad == 0 else f"{bad} problem(s)"
    print(f"checked {total} lines: {status}")
    if bad:
        sys.exit(1)


def list_cfg(argv: list[str]) -> None:
    for f in sorted(EXAMPLES_DIR.rglob("*.py")):
        print(f.relative_to(EXAMPLES_DIR))


def copy_cfg(argv: list[str]) -> None:
    p = argparse.ArgumentParser(prog="copy-cfg")
    p.add_argument("name", help="config name from list-cfg")
    p.add_argument("dest", nargs="?", default=".")
    args = p.parse_args(argv)
    src = EXAMPLES_DIR / args.name
    if not src.exists():
        raise SystemExit(f"no such config {args.name!r}; see `xtuner-tpu list-cfg`")
    dest = Path(args.dest)
    target = dest / src.name if dest.is_dir() else dest
    shutil.copyfile(src, target)
    print(f"copied {src} -> {target}")
