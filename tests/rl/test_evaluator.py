"""Evaluator: pass@k estimator + grouped metrics with a fake rollout."""

import json

import numpy as np
import pytest

from xtuner_tpu.rl.evaluator import Evaluator, EvaluatorConfig, pass_at_k
from xtuner_tpu.rl.judger import GSM8KJudger


def test_pass_at_k_estimator():
    assert pass_at_k(10, 10, 1) == 1.0
    assert pass_at_k(10, 0, 5) == 0.0
    # 1 correct of 2, k=1 -> 0.5
    np.testing.assert_allclose(pass_at_k(2, 1, 1), 0.5)
    # unbiased: n=4, c=2, k=2 -> 1 - C(2,2)/C(4,2) = 1 - 1/6
    np.testing.assert_allclose(pass_at_k(4, 2, 2), 1 - 1 / 6)


def test_evaluator_metrics(tmp_path):
    path = tmp_path / "eval.jsonl"
    with open(path, "w") as f:
        for i in range(4):
            f.write(json.dumps({"prompt": f"q{i}", "label": f"#### {i}",
                                "source": "gsm8k" if i % 2 else "math"}) + "\n")

    def fake_generate(items, n):
        # first sample correct, second wrong
        return [[f"answer is {item['label'].split('####')[-1].strip()}", "answer is 999"]
                for item in items]

    ev = Evaluator(EvaluatorConfig(eval_path=str(path), samples_per_prompt=2, pass_k=[1, 2]),
                   GSM8KJudger(), fake_generate)
    m = ev.run()
    np.testing.assert_allclose(m["eval_mean_reward"], 0.5)
    np.testing.assert_allclose(m["eval/gsm8k_accuracy"], 0.5)
    np.testing.assert_allclose(m["eval/gsm8k_pass@2"], 1.0)
    np.testing.assert_allclose(m["eval/math_pass@1"], 0.5)
