"""Standalone inference server: `xtuner-tpu serve --model /path/to/hf`.

The reference points users at external serving engines for deployment
(`lmdeploy serve` / vLLM — its rollout workers spawn exactly those,
xtuner/v1/rl/rollout/worker.py:510). Here serving is native: this mode
loads an HF checkpoint and exposes the paged continuous-batching engine
(docs/serving.md) over the RolloutWorker's OpenAI-compatible HTTP surface:

    POST /v1/completions   {"prompt": str | [str], "max_tokens": N, ...}
                           (or token-ids native via "prompt_ids")
    POST /v1/chat/completions  {"messages": [{role, content}, ...]} —
                           applied through --chat-template
    GET  /health           liveness + weight version
    POST /pause /resume    drain/admit control
    POST /update_weights   hot-reload from a filesystem snapshot

Per-request sampling params follow the OpenAI names (temperature, top_p,
max_tokens, ...) plus the SampleParams surface (repetition/presence/
frequency penalties, min_tokens, stop_token_ids, top_logprobs).
"""

from __future__ import annotations

import argparse
from typing import Optional

from ...model.generate import GenerateConfig
from ...model.registry import get_model_config
from ...utils.logger import get_logger

logger = get_logger()


def build_worker(args):
    from transformers import AutoTokenizer

    from ...checkpoint.hf import load_hf_checkpoint
    from ...module.params import param_shardings
    from ...parallel.mesh import MeshConfig, build_mesh
    from ...rl.worker import RolloutWorker

    cfg = get_model_config(args.model)
    model_specs = cfg.build().param_specs()
    mesh_cfg = MeshConfig()
    shardings = param_shardings(model_specs, build_mesh(mesh_cfg),
                                mesh_cfg.rules())
    params = load_hf_checkpoint(args.model, model_specs,
                                cfg.build().hf_key_map(), shardings)
    tokenizer = AutoTokenizer.from_pretrained(
        args.tokenizer_path or args.model, trust_remote_code=True)
    gen_cfg = GenerateConfig(
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_p=args.top_p,
        do_sample=args.temperature > 0,
        eos_token_id=cfg.eos_token_id,
        max_length=args.max_length,
        paged_max_batch=args.max_batch,
        paged_block_size=args.block_size,
        kv_cache_dtype=args.kv_cache_dtype,
        prefill_chunk=args.prefill_chunk,
    )
    return RolloutWorker(cfg, params=params, tokenizer=tokenizer,
                         gen_cfg=gen_cfg, host=args.host, port=args.port,
                         chat_template=args.chat_template)


def main(argv: Optional[list[str]] = None) -> None:
    p = argparse.ArgumentParser(description="xtuner-tpu inference server")
    p.add_argument("--model", required=True,
                   help="HF checkpoint dir or registry name")
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--chat-template", default="qwen")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=23333)
    p.add_argument("--max-batch", type=int, default=16,
                   help="decode slots (one compiled program)")
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--max-length", type=int, default=8192,
                   help="prompt + generation KV budget per sequence")
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--prefill-chunk", type=int, default=2048,
                   help="chunked prefill granularity; 0 = whole prompt at "
                        "once (long prompts then block in-flight decodes)")
    p.add_argument("--kv-cache-dtype", default="bf16",
                   choices=("bf16", "int8"),
                   help="int8 = quantized paged KV, ~2x cache capacity")
    args = p.parse_args(argv)

    worker = build_worker(args)
    worker.start()
    logger.info(f"serving {args.model} at http://{args.host}:{worker.port} "
                f"(paged engine, {args.max_batch} slots, "
                f"kv={args.kv_cache_dtype})")
    try:
        worker._thread.join()
    except KeyboardInterrupt:
        worker.stop()


if __name__ == "__main__":
    main()
