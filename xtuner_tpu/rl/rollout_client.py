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

    def generate_fn(self, tokenizer, *, max_tokens: int = 128,
                    temperature: float = 1.0, top_p: float = 1.0):
        """Adapter for the agent loops: returns `fn(prompt_ids) -> (ids,
        logprobs)` backed by this worker's /v1/completions. The loop keeps
        token-level context; the wire carries text (lossless for the byte
        tokenizers; HF tokenizers round-trip their own detokenization)."""

        def fn(prompt_ids: list[int]) -> tuple[list[int], list[float]]:
            prompt = tokenizer.decode(list(prompt_ids))
            choice = self.generate(prompt, max_tokens=max_tokens,
                                   temperature=temperature, top_p=top_p,
                                   logprobs=True)[0]
            ids = tokenizer.encode(choice["text"], add_special_tokens=False)
            lps = choice.get("logprobs") or []
            # logprobs are per-generated-token server-side; pad/trim to the
            # re-tokenized length so Segment stays aligned
            lps = (list(lps) + [0.0] * len(ids))[: len(ids)]
            return ids, lps

        return fn

    def chat(self, messages: list[dict[str, Any]], *, max_tokens: int = 128,
             temperature: float = 1.0, top_p: float = 1.0,
             n: int = 1) -> list[dict[str, Any]]:
        """/v1/chat/completions: -> [{message: {role, content},
        finish_reason}] of length n (server renders its chat template)."""
        if self._paused:
            raise RuntimeError("rollout client is paused")
        resp = self._post("/v1/chat/completions", {
            "model": self.cfg.model, "messages": messages,
            "max_tokens": max_tokens, "temperature": temperature,
            "top_p": top_p, "n": n,
        })
        return [{"message": c.get("message"),
                 "finish_reason": c.get("finish_reason")}
                for c in resp.get("choices", [])]

    def stream(self, prompt: Optional[str] = None, *,
               messages: Optional[list[dict[str, Any]]] = None,
               max_tokens: int = 128, temperature: float = 1.0,
               top_p: float = 1.0):
        """Iterate SSE frames from a streaming completion. Yields the
        per-event choice dicts ({text|delta, token_id, logprob} then a
        finish event); raises on transport errors."""
        if self._paused:
            raise RuntimeError("rollout client is paused")
        if (prompt is None) == (messages is None):
            raise ValueError("stream() needs exactly one of prompt/messages")
        path = "/v1/completions" if messages is None else "/v1/chat/completions"
        payload: dict[str, Any] = {
            "model": self.cfg.model, "max_tokens": max_tokens,
            "temperature": temperature, "top_p": top_p, "stream": True,
        }
        if messages is None:
            payload["prompt"] = prompt
        else:
            payload["messages"] = messages
        url = self.cfg.base_url.rstrip("/") + path
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.cfg.timeout) as resp:
            buf = b""
            while True:
                chunk = resp.read(1)
                if not chunk:
                    break
                buf += chunk
                while b"\n\n" in buf:
                    frame, buf = buf.split(b"\n\n", 1)
                    if not frame.startswith(b"data: "):
                        continue
                    body = frame[len(b"data: "):]
                    if body == b"[DONE]":
                        return
                    ev = json.loads(body)
                    if "choices" in ev:
                        yield ev["choices"][0]
