"""Chat REPL (reference: legacy v0 tools/chat.py — `xtuner chat MODEL`).

    python -m xtuner_tpu.train.cli.chat --model /path/to/hf [--temperature 0.7]
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

from ...data_proto.templates import get_chat_template
from ...model.generate import GenerateConfig, generate
from ...model.registry import get_model_config
from ...utils.logger import get_logger

logger = get_logger()


def main(argv: Optional[list[str]] = None) -> None:
    p = argparse.ArgumentParser(description="xtuner-tpu chat REPL")
    p.add_argument("--model", required=True, help="HF checkpoint dir or registry name")
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--chat-template", default="qwen")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--prompt", default=None, help="single-shot prompt (no REPL)")
    args = p.parse_args(argv)

    from transformers import AutoTokenizer

    from ...checkpoint.hf import load_hf_checkpoint
    from ...module.params import param_shardings
    from ...parallel.mesh import MeshConfig, build_mesh

    cfg = get_model_config(args.model)
    model = cfg.build()
    mesh_cfg = MeshConfig()
    shardings = param_shardings(model.param_specs(), build_mesh(mesh_cfg), mesh_cfg.rules())
    params = load_hf_checkpoint(args.model, model.param_specs(), model.hf_key_map(), shardings)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model,
                                              trust_remote_code=True)
    template = get_chat_template(args.chat_template)
    gen_cfg = GenerateConfig(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        top_p=args.top_p, do_sample=args.temperature > 0,
        eos_token_id=cfg.eos_token_id,
    )

    def reply(history_text: str) -> str:
        ids = tokenizer.encode(history_text, add_special_tokens=False)
        out = generate(model, params, np.asarray([ids], np.int32), gen_cfg,
                       pad_token_id=cfg.pad_token_id or 0)
        resp = out["generated"][0].tolist()
        if cfg.eos_token_id in resp:
            resp = resp[: resp.index(cfg.eos_token_id)]
        return tokenizer.decode(resp)

    if args.prompt is not None:
        print(reply(template.user.format(user=args.prompt)))
        return

    history = ""
    print("xtuner-tpu chat — empty line to exit")
    while True:
        try:
            user = input("\n>>> ").strip()
        except EOFError:
            break
        if not user:
            break
        history += template.user.format(user=user)
        answer = reply(history)
        history += template.assistant.format(assistant=answer)
        print(answer)


if __name__ == "__main__":
    main()
