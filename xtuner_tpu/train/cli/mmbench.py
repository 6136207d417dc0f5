"""MMBench VLM evaluation (reference: xtuner/tools/mmbench.py, 542 LoC).

Reads the MMBench TSV (index, question, options A-D, base64 image, optional
answer/category), rolls each question through the engine-native VLM generate,
extracts the predicted option, and reports accuracy per category (dev split)
or writes a submission file (test split). TPU shape: one engine, greedy
decode, no torch/mmengine/DDP rank plumbing.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import re
import string
from pathlib import Path

import numpy as np

from ...utils.logger import get_logger

logger = get_logger()

OPTION_COLS = ["A", "B", "C", "D"]


def decode_base64_image(data: str) -> np.ndarray:
    """base64 jpg/png -> (H, W, 3) uint8 (reference decode_base64_to_image)."""
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    return np.asarray(img)


def build_prompt(row: dict) -> str:
    """Question + hint + lettered options (reference mmbench.py prompt)."""
    parts = []
    hint = row.get("hint")
    if hint and str(hint) != "nan":
        parts.append(f"Hint: {hint}")
    parts.append(f"Question: {row['question']}")
    opts = [f"{c}. {row[c]}" for c in OPTION_COLS if row.get(c) and str(row[c]) != "nan"]
    if opts:
        parts.append("Options:\n" + "\n".join(opts))
        parts.append("Please select the correct answer from the options above.")
    return "\n".join(parts)


def extract_answer(text: str, row: dict) -> str:
    """Predicted option letter: leading letter, quoted letter, or option-text
    containment (compact version of the reference's answer extraction)."""
    text = text.strip()
    m = re.match(r"^\(?([A-D])\)?\b", text)
    if m:
        return m.group(1)
    m = re.search(r"\b([A-D])\b", text)
    if m:
        return m.group(1)
    lowered = text.lower()
    for c in OPTION_COLS:
        opt = row.get(c)
        if opt and str(opt) != "nan" and str(opt).lower() in lowered:
            return c
    return ""


def load_tsv(path: str | Path) -> list[dict]:
    import pandas as pd

    df = pd.read_csv(path, sep="\t")
    df.columns = [str(c).lower() if str(c).lower() in
                  ("index", "question", "answer", "category", "hint", "image",
                   "l2-category", "split") else str(c) for c in df.columns]
    return df.to_dict("records")


class MMBenchEvaluator:
    def __init__(self, model, params, tokenize_fn, tokenizer, gen_cfg,
                 compute_dtype=None, collate_kwargs=None):
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.tokenize_fn = tokenize_fn
        self.tokenizer = tokenizer
        self.gen_cfg = gen_cfg
        self.compute_dtype = compute_dtype or jnp.bfloat16
        self.collate_kwargs = collate_kwargs or {}

    def _generate_answer(self, row: dict) -> str:
        """One question -> generated text (engine-native VLM decode is not
        wired for the compose models' vision scatter during generation, so we
        run TEXT decode on the vision-fused embedding prompt by materializing
        inputs_embeds — compact but exact)."""
        from ...model.generate import GenerateConfig, generate  # noqa: F401

        img = decode_base64_image(row["image"])
        item = {"messages": [{"role": "user", "content": [
            {"type": "image", "image": img},
            {"type": "text", "text": build_prompt(row)},
        ]}]}
        sample = self.tokenize_fn(item)
        text = _vlm_greedy_decode(self.model, self.params, sample, self.tokenizer,
                                  self.gen_cfg, self.compute_dtype,
                                  **self.collate_kwargs)
        return text

    def run(self, rows: list[dict], work_dir: Path) -> dict:
        work_dir.mkdir(parents=True, exist_ok=True)
        results = []
        n_correct, n_answered = 0, 0
        per_cat: dict[str, list[int]] = {}
        for i, row in enumerate(rows):
            text = self._generate_answer(row)
            pred = extract_answer(text, row)
            rec = {"index": row.get("index", i), "prediction": pred, "raw": text}
            answer = row.get("answer")
            if answer is not None and str(answer) != "nan":
                ok = int(pred == str(answer).strip().upper())
                rec["answer"] = answer
                rec["correct"] = ok
                n_correct += ok
                n_answered += 1
                cat = str(row.get("category", "all"))
                per_cat.setdefault(cat, []).append(ok)
            results.append(rec)
        (work_dir / "mmbench_results.jsonl").write_text(
            "\n".join(json.dumps(r) for r in results) + "\n")
        summary: dict = {"total": len(rows)}
        if n_answered:
            summary["accuracy"] = n_correct / n_answered
            summary["per_category"] = {c: float(np.mean(v)) for c, v in per_cat.items()}
            (work_dir / "mmbench_summary.json").write_text(json.dumps(summary, indent=1))
            logger.info(f"MMBench accuracy {summary['accuracy']:.4f} over {n_answered}")
        return summary


def _vlm_greedy_decode(model, params, sample, tokenizer, gen_cfg, compute_dtype,
                       **collate_kwargs):
    """Teacher-forced greedy decode for compose VLMs: the full (prompt +
    generated-so-far) sequence re-runs model.forward each step. O(n^2) but
    exact and compile-cached via bucketed lengths — benchmark batches are
    single questions."""
    import jax.numpy as jnp

    from ...datasets.qwen_vl import qwen3vl_collator

    ids = list(sample["input_ids"])
    eos = gen_cfg.eos_token_id
    generated: list[int] = []
    for _ in range(gen_cfg.max_new_tokens):
        cur = dict(sample)
        cur["input_ids"] = ids + generated
        cur["labels"] = cur["input_ids"]
        cur["num_tokens"] = len(cur["input_ids"])
        if "mrope_positions" in cur:
            import numpy as _np

            extra = len(generated)
            mp = cur["mrope_positions"]
            cont = mp[:, -1:] + _np.arange(1, extra + 1)[None]
            cur["mrope_positions"] = _np.concatenate([mp, cont], axis=1) if extra else mp
            cur["image_token_mask"] = _np.concatenate(
                [sample["image_token_mask"], _np.zeros(extra, bool)])
        # bucket pack length to limit recompiles
        n = cur["num_tokens"]
        pack = max(128, -(-n // 128) * 128)
        batch = qwen3vl_collator([[cur]], pack_max_length=pack, **collate_kwargs)
        from ...data_proto import SequenceContext

        ctx = SequenceContext(
            input_ids=jnp.asarray(batch["input_ids"]),
            segment_ids=jnp.asarray(batch["segment_ids"]),
            position_ids=jnp.asarray(batch["position_ids"]),
            pixel_values=jnp.asarray(batch["pixel_values"]) if "pixel_values" in batch else None,
            image_token_mask=jnp.asarray(batch["image_token_mask"]) if "image_token_mask" in batch else None,
            mrope_positions=jnp.asarray(batch["mrope_positions"]) if "mrope_positions" in batch else None,
            **{k: jnp.asarray(batch[k]) for k in
               ("vision_segment_ids", "vision_rot_pos", "vision_pos_interp_idx",
                "vision_pos_interp_w") if k in batch},
        )
        hidden = model.forward(params, ctx, compute_dtype=compute_dtype)
        logits = hidden[0, n - 1] @ model.lm_head_weight(params).astype(hidden.dtype)
        nxt = int(jnp.argmax(logits))
        if eos is not None and nxt == eos:
            break
        generated.append(nxt)
    return tokenizer.decode(generated)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="MMBench VLM evaluation")
    parser.add_argument("model", help="registry name or HF checkpoint dir")
    parser.add_argument("--data-path", required=True, help="MMBench TSV")
    parser.add_argument("--work-dir", default="work_dirs/mmbench")
    parser.add_argument("--tokenizer-path", default=None)
    parser.add_argument("--max-new-tokens", type=int, default=16)
    parser.add_argument("--max-patches", type=int, default=4096)
    args = parser.parse_args(argv)

    import jax

    from transformers import AutoTokenizer

    from ...checkpoint.hf import load_hf_checkpoint
    from ...datasets.qwen_vl import Qwen3VLTokenizeFn
    from ...model.generate import GenerateConfig
    from ...model.registry import get_model_config
    from ...module.params import param_shardings
    from ...parallel import MeshConfig, build_mesh

    cfg = get_model_config(args.model)
    model = cfg.build()
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model,
                                              trust_remote_code=True)
    mesh_cfg = MeshConfig()
    mesh = build_mesh(mesh_cfg)
    specs = model.param_specs()
    params = load_hf_checkpoint(args.model, specs, model.hf_key_map(),
                                param_shardings(specs, mesh, mesh_cfg.rules()))
    fn = Qwen3VLTokenizeFn(tokenizer)
    gen_cfg = GenerateConfig(max_new_tokens=args.max_new_tokens, do_sample=False,
                             eos_token_id=cfg.eos_token_id)
    ev = MMBenchEvaluator(model, params, fn, tokenizer, gen_cfg)
    ev.run(load_tsv(args.data_path), Path(args.work_dir))


if __name__ == "__main__":
    main()
