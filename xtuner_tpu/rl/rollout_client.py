"""Rollout against an external OpenAI-compatible inference server.

Reference: xtuner/v1/rl/rollout/worker.py (:510 RolloutWorker speaking
OpenAI-compatible HTTP to LMDeploy/vLLM/SGLang servers, per-token logprobs
:784, pause/abort :730). This client covers the same wire protocol with
stdlib urllib (zero extra deps); the server subprocess management of the
reference maps to pointing `base_url` at any running engine.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Optional

from pydantic import BaseModel, ConfigDict

from ..utils.logger import get_logger

logger = get_logger()


class RolloutClientConfig(BaseModel):
    model_config = ConfigDict(extra="forbid")
    base_url: str  # e.g. http://localhost:8000
    model: str = "default"
    api_key: Optional[str] = None
    timeout: float = 300.0
    max_retries: int = 3
    retry_backoff: float = 1.0


class RolloutClient:
    """Minimal /v1/completions client returning text + token logprobs."""

    def __init__(self, cfg: RolloutClientConfig):
        self.cfg = cfg
        self._paused = False

    # reference worker pause/abort surface (worker.py:730-748)
    def pause(self) -> None:
        self._paused = True

    def resume(self) -> None:
        self._paused = False

    def _post_url(self, base_url: str, path: str, payload: dict) -> dict:
        """POST against an explicit worker url (registry-routed callers)."""
        url = base_url.rstrip("/") + path
        return self._post_abs(url, payload)

    def _post(self, path: str, payload: dict) -> dict:
        return self._post_abs(self.cfg.base_url.rstrip("/") + path, payload)

    def _post_abs(self, url: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        if self.cfg.api_key:
            headers["Authorization"] = f"Bearer {self.cfg.api_key}"
        last_err: Exception | None = None
        for attempt in range(self.cfg.max_retries):
            try:
                req = urllib.request.Request(url, data=body, headers=headers)
                with urllib.request.urlopen(req, timeout=self.cfg.timeout) as resp:
                    return json.loads(resp.read())
            except (urllib.error.URLError, TimeoutError) as e:
                last_err = e
                time.sleep(self.cfg.retry_backoff * (attempt + 1))
        raise RuntimeError(f"rollout server unreachable after retries: {last_err}")

    def health(self) -> bool:
        try:
            self._post("/v1/completions", {"model": self.cfg.model, "prompt": "", "max_tokens": 1})
            return True
        except Exception:
            return False

    def generate(self, prompt: str, *, max_tokens: int = 128, temperature: float = 1.0,
                 top_p: float = 1.0, n: int = 1, stop: Optional[list[str]] = None,
                 logprobs: bool = True) -> list[dict[str, Any]]:
        """-> [{text, token_ids?, logprobs?, finish_reason}] of length n."""
        if self._paused:
            raise RuntimeError("rollout client is paused")
        payload: dict[str, Any] = {
            "model": self.cfg.model,
            "prompt": prompt,
            "max_tokens": max_tokens,
            "temperature": temperature,
            "top_p": top_p,
            "n": n,
        }
        if stop:
            payload["stop"] = stop
        if logprobs:
            payload["logprobs"] = 1
        resp = self._post("/v1/completions", payload)
        out = []
        for choice in resp.get("choices", []):
            item: dict[str, Any] = {
                "text": choice.get("text", ""),
                "finish_reason": choice.get("finish_reason"),
            }
            lp = choice.get("logprobs") or {}
            if lp.get("token_logprobs"):
                item["logprobs"] = lp["token_logprobs"]
                item["tokens"] = lp.get("tokens")
            out.append(item)
        return out
