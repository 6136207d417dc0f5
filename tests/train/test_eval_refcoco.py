"""RefCOCO eval CLI: bbox parsing, IoU scoring, evaluator end-to-end on a
tiny compose VLM. Reference behavior: xtuner/tools/eval_refcoco.py."""

import json

import numpy as np
import pytest

from xtuner_tpu.train.cli.eval_refcoco import (
    RefCOCOEvaluator,
    compute_iou,
    eval_iou,
    load_eval_items,
    normalize_bbox,
    parse_bbox,
)


def test_normalize_bbox_matches_converter_convention():
    # same item as test_refcoco_converter_and_cli: [0,1000) grounding ints
    assert normalize_bbox([10, 20, 30, 40], 100, 200) == [50, 200, 200, 600]


def test_parse_bbox():
    assert parse_bbox("[50, 200, 200, 600]") == [50, 200, 200, 600]
    assert parse_bbox("box: {<10><20><30><40>} extra 99") == [10, 20, 30, 40]
    assert parse_bbox("I cannot find it") is None
    assert parse_bbox("only 1 2 3") is None


def test_compute_iou():
    assert compute_iou([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert compute_iou([0, 0, 9, 9], [20, 20, 29, 29]) == 0.0
    # half-overlap: inter 50, union 150 (inclusive-pixel convention)
    iou = compute_iou([0, 0, 9, 9], [5, 0, 14, 9])
    assert abs(iou - 50 / 150) < 1e-9


def test_eval_iou_accuracy_and_malformed():
    answers = [
        {"ans": "[10, 10, 110, 110]", "bbox": [10, 10, 110, 110]},  # exact
        {"ans": "[500, 500, 600, 600]", "bbox": [10, 10, 110, 110]},  # miss
        {"ans": "no box found", "bbox": [10, 10, 110, 110]},  # malformed
    ]
    s = eval_iou(answers)
    assert s["total"] == 3 and s["malformed"] == 1
    assert abs(s["accuracy"] - 1 / 3) < 1e-9


def test_load_eval_items_expands_sentences(tmp_path):
    p = tmp_path / "eval.jsonl"
    p.write_text(json.dumps({
        "image": "x.jpg", "bbox": [1, 2, 3, 4], "height": 10, "width": 10,
        "sentences": [{"sent": "a"}, {"sent": "b"}]}) + "\n")
    items = load_eval_items(p)
    assert [i["sentence"] for i in items] == ["a", "b"]


@pytest.mark.slow
def test_refcoco_evaluator_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from tests.model.test_qwen3_vl import tiny_our_config
    from xtuner_tpu.datasets.qwen_vl import Qwen3VLTokenizeFn
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.module.params import init_params

    cfg, tok = tiny_our_config()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64)
    rng = np.random.default_rng(0)
    items = [{"id": i, "image": rng.integers(0, 255, (40, 40, 3)).astype(np.uint8),
              "sentence": f"object {i}", "bbox": [4, 4, 16, 16],
              "height": 40, "width": 40} for i in range(2)]
    ev = RefCOCOEvaluator(model, params, fn, tok,
                          GenerateConfig(max_new_tokens=4, do_sample=False,
                                         eos_token_id=258),
                          compute_dtype=jnp.float32,
                          collate_kwargs=dict(num_grid_per_side=4, merge_size=2,
                                              max_patches=256))
    summary = ev.run(items, tmp_path / "out")
    assert summary["total"] == 2
    recs = [json.loads(l) for l in
            (tmp_path / "out" / "refcoco_results.jsonl").read_text().splitlines()]
    assert len(recs) == 2 and all(len(r["bbox"]) == 4 for r in recs)
    assert (tmp_path / "out" / "refcoco_summary.json").exists()
