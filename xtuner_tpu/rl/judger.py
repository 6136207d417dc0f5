"""Judgers (reward functions).

Reference: xtuner/v1/rl/judger/ — GSM8K (gsm8k.py:80), DAPO math (:293),
composed multi-judger (:23-177), remote LLM-judge HTTP (CompassVerifier).
Local judgers are plain callables; the remote judger uses urllib (no httpx
dependency) and is gated on network availability.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Protocol


class Judger(Protocol):
    def judge(self, response: str, label: Any) -> float: ...


def extract_last_number(text: str) -> Optional[str]:
    matches = re.findall(r"-?\d[\d,]*\.?\d*", text.replace("$", ""))
    if not matches:
        return None
    return matches[-1].rstrip(".").replace(",", "")


def extract_boxed(text: str) -> Optional[str]:
    m = re.findall(r"\\boxed\{([^{}]*)\}", text)
    return m[-1].strip() if m else None


class GSM8KJudger:
    """Reward 1.0 for the correct final answer (reference gsm8k.py:80:
    '#### <answer>' gold format, last-number extraction from the response)."""

    def __init__(self, extract_fn: str = "last_number"):
        self.extract_fn = extract_fn

    def judge(self, response: str, label: Any) -> float:
        gold = str(label).split("####")[-1].strip().replace(",", "")
        pred = extract_boxed(response) or extract_last_number(response)
        if pred is None:
            return 0.0
        try:
            return 1.0 if abs(float(pred) - float(gold)) < 1e-6 else 0.0
        except ValueError:
            return 1.0 if pred == gold else 0.0


class MathBoxedJudger:
    """DAPO-style: compare \\boxed{...} answers literally (judger/gsm8k.py:293)."""

    def judge(self, response: str, label: Any) -> float:
        pred = extract_boxed(response)
        return 1.0 if pred is not None and pred == str(label).strip() else 0.0


class ComposedJudger:
    """Weighted sum of judgers keyed by data source (reference multi-judger)."""

    def __init__(self, judgers: dict[str, Judger], weights: Optional[dict[str, float]] = None):
        self.judgers = judgers
        self.weights = weights or {}

    def judge(self, response: str, label: Any, source: str = "default") -> float:
        judger = self.judgers.get(source) or next(iter(self.judgers.values()))
        w = self.weights.get(source, 1.0)
        return w * judger.judge(response, label)


JUDGER_MAP = {
    "gsm8k": GSM8KJudger,
    "math_boxed": MathBoxedJudger,
}


VERIFY_PROMPT = (
    "You are a strict verifier. Question:\n{question}\n\n"
    "Model answer:\n{response}\n\nGold answer:\n{label}\n\n"
    "Reply with exactly one token: A if the model answer is equivalent to the "
    "gold answer, B otherwise."
)


class HTTPJudger:
    """LLM-judge over an OpenAI-compatible chat endpoint (reference
    judger/compass_verifier_v2.py — CompassVerifier HTTP verification). The
    verifier model answers A (correct) / B (incorrect) for one token; retries
    across hosts; scores -1 (the reference's 'unjudgeable' sentinel) if every
    attempt fails.

    Works against any in-cluster serving endpoint (this framework's own
    `rl/worker.py` included); nothing leaves the host network."""

    def __init__(self, hosts: list[str], model: str = "", max_retries: int = 3,
                 timeout: float = 30.0, question: str = "",
                 thinking_finish_words: Optional[list[str]] = None,
                 unjudgeable_score: float = 0.0):
        if not hosts:
            raise ValueError("HTTPJudger requires at least one host url")
        self.hosts = [h.rstrip("/") for h in hosts]
        self.model = model
        self.max_retries = max_retries
        self.timeout = timeout
        self.question = question
        self.thinking_finish_words = thinking_finish_words or [
            "<conclude>", "**Final Answer**", "</think>"]
        # score when every attempt fails: defaults to NEUTRAL (0) so verifier
        # outages do not train the policy away from those samples; set -1 to
        # get the reference's sentinel and filter upstream
        self.unjudgeable_score = unjudgeable_score

    def _clean(self, response: str) -> str:
        response = response.replace("<|im_end|>", "").strip()
        for w in self.thinking_finish_words:
            if w in response:
                response = response.split(w)[-1]
        lines = response.split("\n")
        if len(lines) > 10:
            response = "\n".join(lines[-10:])
        return response[-1000:]

    def judge(self, response: str, label: Any) -> float:
        import json as _json
        import urllib.request

        prompt = VERIFY_PROMPT.format(question=self.question,
                                      response=self._clean(response), label=label)
        payload = {"model": self.model, "max_tokens": 1, "temperature": 0,
                   "messages": [{"role": "user", "content": prompt}]}
        for attempt in range(self.max_retries):
            host = self.hosts[attempt % len(self.hosts)]
            try:
                req = urllib.request.Request(
                    host + "/v1/chat/completions",
                    data=_json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    out = _json.loads(resp.read())
                text = out["choices"][0]["message"]["content"].strip()
                return 1.0 if text.upper().startswith("A") else 0.0
            except Exception:
                continue
        from ..utils.logger import get_logger

        get_logger().warning(f"HTTPJudger: all {self.max_retries} attempts failed; "
                             f"scoring {self.unjudgeable_score}")
        return self.unjudgeable_score
