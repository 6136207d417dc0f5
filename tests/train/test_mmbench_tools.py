"""MMBench evaluator + dataset preprocess converters."""

import base64
import io
import json

import numpy as np
import pytest

from xtuner_tpu.datasets.convert_tools import (alpaca_to_openai, arxiv_to_openai,
                                               convert, refcoco_to_openai,
                                               sharegpt_to_openai)
from xtuner_tpu.train.cli.mmbench import (MMBenchEvaluator, build_prompt,
                                          extract_answer, load_tsv)


def test_extract_answer():
    row = {"A": "cat", "B": "dog", "C": "bird", "D": "fish"}
    assert extract_answer("B. dog", row) == "B"
    assert extract_answer("(C)", row) == "C"
    assert extract_answer("The answer is D", row) == "D"
    assert extract_answer("it is a dog", row) == "B"
    assert extract_answer("no idea", row) == ""


def test_build_prompt():
    row = {"question": "What animal?", "A": "cat", "B": "dog", "C": float("nan"),
           "D": float("nan"), "hint": "It barks."}
    p = build_prompt(row)
    assert "Hint: It barks." in p and "A. cat" in p and "C." not in p


def _b64_image(seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.mark.slow
def test_mmbench_evaluator_end_to_end(tmp_path):
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from xtuner_tpu.datasets.qwen_vl import Qwen3VLTokenizeFn
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.module.params import init_params
    from tests.model.test_qwen3_vl import tiny_our_config

    cfg, tok = tiny_our_config()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64)

    rows = []
    for i in range(2):
        rows.append({"index": i, "question": f"What is shown {i}?",
                     "A": "cat", "B": "dog", "C": "bird", "D": "fish",
                     "answer": "A", "category": "animals",
                     "hint": float("nan"), "image": _b64_image(i)})
    tsv = tmp_path / "bench.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    ev = MMBenchEvaluator(model, params, fn, tok,
                          GenerateConfig(max_new_tokens=3, do_sample=False,
                                         eos_token_id=258),
                          compute_dtype=jnp.float32,
                          collate_kwargs=dict(num_grid_per_side=4, merge_size=2,
                                              max_patches=256))
    summary = ev.run(load_tsv(tsv), tmp_path / "out")
    assert summary["total"] == 2 and "accuracy" in summary
    recs = [json.loads(l) for l in
            (tmp_path / "out" / "mmbench_results.jsonl").read_text().splitlines()]
    assert len(recs) == 2 and all("prediction" in r for r in recs)
    assert (tmp_path / "out" / "mmbench_summary.json").exists()


def test_alpaca_converter():
    out = list(alpaca_to_openai([
        {"instruction": "add", "input": "1+1", "output": "2"},
        {"instruction": "skip", "input": "", "output": "<nooutput>"},
    ]))
    assert len(out) == 1
    assert out[0]["messages"][0]["content"] == "add\n1+1"
    assert out[0]["messages"][1] == {"role": "assistant", "content": "2"}


def test_sharegpt_converter():
    out = list(sharegpt_to_openai([{
        "conversations": [{"from": "system", "value": "be nice"},
                          {"from": "human", "value": "hi"},
                          {"from": "gpt", "value": "hello"}],
        "image": "img.png",
    }]))
    assert [m["role"] for m in out[0]["messages"]] == ["system", "user", "assistant"]
    assert out[0]["image"] == "img.png"


def test_arxiv_converter():
    items = [
        {"categories": "cs.CL", "update_date": "2023-01-01",
         "abstract": "We study LLMs.", "title": "A Study"},
        {"categories": "math.CO", "update_date": "2023-01-01",
         "abstract": "x", "title": "y"},
        {"categories": "cs.CL", "update_date": "2019-01-01",
         "abstract": "x", "title": "y"},
    ]
    out = list(arxiv_to_openai(items))
    assert len(out) == 1 and "A Study" == out[0]["messages"][1]["content"]


def test_refcoco_converter_and_cli(tmp_path):
    items = [{"sentences": [{"sent": "the red cup"}], "bbox": [10, 20, 30, 40],
              "image": "coco/1.jpg", "height": 100, "width": 200}]
    out = list(refcoco_to_openai(items))
    assert out[0]["image"] == "coco/1.jpg"
    assert json.loads(out[0]["messages"][1]["content"]) == [50, 200, 200, 600]
    # file round trip through convert()
    src = tmp_path / "raw.json"
    src.write_text(json.dumps(items))
    n = convert("refcoco", src, tmp_path / "out.jsonl")
    assert n == 1
    rec = json.loads((tmp_path / "out.jsonl").read_text())
    assert "<image>" in rec["messages"][0]["content"]
