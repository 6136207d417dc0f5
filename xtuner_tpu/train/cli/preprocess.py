"""Dataset preprocess CLI (reference: xtuner/tools/data_preprocess/ +
process_untokenized_datasets): convert common raw formats to the OpenAI
jsonl the v1 data stack consumes, or pre-tokenize a dataset to warm the
token-count cache."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="dataset preprocess tools")
    sub = parser.add_subparsers(dest="cmd", required=True)

    conv = sub.add_parser("convert", help="raw format -> openai jsonl")
    conv.add_argument("format", choices=["alpaca", "sharegpt", "arxiv", "refcoco"])
    conv.add_argument("input")
    conv.add_argument("output")
    conv.add_argument("--image-root", default="")
    conv.add_argument("--categories", nargs="*", default=None)
    conv.add_argument("--start-date", default="2020-01-01")

    count = sub.add_parser("count", help="pre-tokenize + warm the count cache")
    count.add_argument("anno_path")
    count.add_argument("--tokenizer-path", required=True)
    count.add_argument("--chat-template", default="qwen")
    count.add_argument("--cache-dir", default=None)
    count.add_argument("--num-proc", type=int, default=0)

    args = parser.parse_args(argv)
    if args.cmd == "convert":
        from ...datasets.convert_tools import convert

        kw = {}
        if args.format == "refcoco":
            kw["image_root"] = args.image_root
        if args.format == "arxiv":
            kw["categories"] = args.categories
            kw["start_date"] = args.start_date
        n = convert(args.format, args.input, args.output, **kw)
        print(f"wrote {n} records -> {args.output}")
    else:
        from pathlib import Path

        from transformers import AutoTokenizer

        from ...datasets.jsonl import JsonlDataset
        from ...datasets.tokenize_fns import OpenaiSFTTokenizeFn

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_path,
                                                  trust_remote_code=True)
        fn = OpenaiSFTTokenizeFn(tokenizer, args.chat_template)
        path = Path(args.anno_path)
        files = sorted(path.glob("*.jsonl")) if path.is_dir() else [path]
        total = 0
        for f in files:
            ds = JsonlDataset(f, fn, cache_dir=args.cache_dir, num_proc=args.num_proc)
            total += sum(ds.num_tokens)
            print(f"{f}: {len(ds)} samples, {sum(ds.num_tokens)} tokens")
        print(f"total tokens: {total}")


if __name__ == "__main__":
    main()
