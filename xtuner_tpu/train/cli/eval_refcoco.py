"""RefCOCO referring-expression evaluation (reference:
xtuner/tools/eval_refcoco.py, 369 LoC — generate a grounded bbox for each
referring expression, parse the 4 coordinates, score IoU@0.5 accuracy).

TPU shape: one engine, the same compose-VLM greedy decode MMBench uses, no
torch/mmengine/DDP rank plumbing (reference merge_outputs/all_gather_object
disappears — a single host walks the eval set; shard by slicing the jsonl).
Coordinate convention: [0, 1000) normalized ints, matching this repo's
refcoco converter (datasets/convert_tools.py refcoco_to_openai) — the
reference normalizes to [0, 100) (refcoco_json.py:167-172); IoU is
scale-invariant so accuracy is comparable.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np

from ...utils.logger import get_logger

logger = get_logger()


def normalize_bbox(bbox: list[float], height: float, width: float) -> list[int]:
    """[x, y, w, h] pixels -> [x1, y1, x2, y2] in [0, 1000) grounding ints
    (same convention as convert_tools.refcoco_to_openai)."""
    x, y, w, h = bbox
    return [round(x / width * 1000), round(y / height * 1000),
            round((x + w) / width * 1000), round((y + h) / height * 1000)]


def parse_bbox(text: str) -> list[int] | None:
    """First 4 integers in the generated text (reference eval_refcoco.py:136
    re.findall(r'\\d+')); None when the model produced a malformed answer."""
    nums = re.findall(r"\d+", text)
    if len(nums) < 4:
        return None
    return [int(x) for x in nums[:4]]


def compute_iou(a: list[int], b: list[int]) -> float:
    """Inclusive-pixel IoU (reference eval_refcoco.py:114-128 computeIoU,
    +1 box convention preserved)."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
    area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def eval_iou(answers: list[dict], thresh: float = 0.5) -> dict:
    """answers: [{ans, bbox(normalized gt), ...}] -> accuracy summary
    (reference eval_refcoco.py:113-143; malformed predictions count wrong)."""
    right, malformed = 0, 0
    for a in answers:
        pred = parse_bbox(a["ans"])
        if pred is None:
            malformed += 1
            continue
        if compute_iou(pred, a["bbox"]) > thresh:
            right += 1
    n = max(len(answers), 1)
    return {"total": len(answers), "accuracy": right / n,
            "malformed": malformed, "iou_thresh": thresh}


def load_eval_items(path: str | Path) -> list[dict]:
    """Eval jsonl: {image, sentence|prompt, bbox [x,y,w,h], height, width}
    per line — the raw-annotation sibling of the train-side converter."""
    items = []
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        it = json.loads(line)
        sents = it.get("sentences") or [it.get("sentence") or it.get("prompt", "")]
        if isinstance(sents, str):
            sents = [sents]
        for sent in sents:
            text = sent["sent"] if isinstance(sent, dict) else sent
            items.append({**it, "sentence": text})
    return items


class RefCOCOEvaluator:
    """Walks eval items through the compose-VLM greedy decode and scores
    IoU@0.5 (reference eval_refcoco.py main loop)."""

    def __init__(self, model, params, tokenize_fn, tokenizer, gen_cfg,
                 compute_dtype=None, collate_kwargs=None, image_root: str = ""):
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.tokenize_fn = tokenize_fn
        self.tokenizer = tokenizer
        self.gen_cfg = gen_cfg
        self.compute_dtype = compute_dtype or jnp.bfloat16
        self.collate_kwargs = collate_kwargs or {}
        self.image_root = image_root

    def _load_image(self, item: dict) -> np.ndarray:
        img = item["image"]
        if isinstance(img, np.ndarray):
            return img
        from PIL import Image

        path = Path(self.image_root) / img if self.image_root else Path(img)
        return np.asarray(Image.open(path).convert("RGB"))

    def _generate_answer(self, item: dict) -> str:
        from .mmbench import _vlm_greedy_decode

        prompt = ("Please provide the bounding box coordinate of the region "
                  f"this sentence describes: {item['sentence']}")
        sample = self.tokenize_fn({"messages": [{"role": "user", "content": [
            {"type": "image", "image": self._load_image(item)},
            {"type": "text", "text": prompt},
        ]}]})
        return _vlm_greedy_decode(self.model, self.params, sample, self.tokenizer,
                                  self.gen_cfg, self.compute_dtype,
                                  **self.collate_kwargs)

    def run(self, items: list[dict], work_dir: Path) -> dict:
        work_dir.mkdir(parents=True, exist_ok=True)
        answers = []
        for i, item in enumerate(items):
            gt = normalize_bbox(item["bbox"], item["height"], item["width"])
            ans = self._generate_answer(item)
            answers.append({"id": item.get("id", i), "ans": ans, "bbox": gt,
                            "sentence": item["sentence"]})
        (work_dir / "refcoco_results.jsonl").write_text(
            "\n".join(json.dumps(a) for a in answers) + "\n")
        summary = eval_iou(answers)
        (work_dir / "refcoco_summary.json").write_text(json.dumps(summary, indent=1))
        logger.info(f"RefCOCO Acc@{summary['iou_thresh']}: {summary['accuracy']:.4f} "
                    f"over {summary['total']} ({summary['malformed']} malformed)")
        return summary


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="RefCOCO referring-expression eval")
    parser.add_argument("model", help="registry name or HF checkpoint dir")
    parser.add_argument("--data-path", required=True,
                        help="eval jsonl: {image, sentence, bbox, height, width}")
    parser.add_argument("--image-root", default="")
    parser.add_argument("--work-dir", default="work_dirs/refcoco")
    parser.add_argument("--tokenizer-path", default=None)
    parser.add_argument("--max-new-tokens", type=int, default=48)
    args = parser.parse_args(argv)

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
    ev = RefCOCOEvaluator(model, params, fn, tokenizer, gen_cfg,
                          image_root=args.image_root)
    ev.run(load_eval_items(args.data_path), Path(args.work_dir))


if __name__ == "__main__":
    main()
