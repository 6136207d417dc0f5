"""Rollout worker: HTTP server wrapping engine-native generation.

Reference: xtuner/v1/rl/rollout/worker.py (RolloutWorker :510 — OpenAI wire
protocol, per-token logprobs :784, pause/abort :730, update_weights) and the
engine backends (vllm.py/sglang.py/lmdeploy.py). TPU redesign: the "engine"
IS model/generate.py on the local chip/mesh — one ThreadingHTTPServer exposes

  POST /v1/completions   prompt text OR prompt_ids; returns token ids,
                         sampled-token logprobs, text (when a tokenizer is
                         attached), finish_reason, and the serving policy
                         version (for staleness/truncated-IS bookkeeping)
  GET  /health           liveness + current weight version
  POST /pause /resume    generation gate (weight-sync windows)
  POST /update_weights   {"path": snapshot_dir} filesystem transport reload,
                         or {"version": n} colocate bump (params already
                         swapped via the shared ParamStore)

MoE models additionally return per-token routed expert indices when asked
(`return_routing`) — the R3 rollout-routing-replay hook (worker.py:784).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.generate import GenerateConfig, generate
from ..utils.logger import get_logger
from .transport import ParamStore

logger = get_logger()


class RolloutWorker:
    def __init__(self, model_cfg, params=None, tokenizer=None,
                 gen_cfg: Optional[GenerateConfig] = None,
                 host: str = "127.0.0.1", port: int = 0,
                 compute_dtype=jnp.bfloat16, pad_token_id: int = 0,
                 param_store: Optional[ParamStore] = None,
                 chat_template: Optional[str] = None):
        self.model_cfg = model_cfg
        self.model = model_cfg.build()
        self.store = param_store if param_store is not None else ParamStore(params)
        self.tokenizer = tokenizer
        self.chat_template = chat_template  # template name for /v1/chat/*
        self.gen_defaults = gen_cfg or GenerateConfig()
        self.compute_dtype = compute_dtype
        self.pad_token_id = pad_token_id
        self.host, self.port = host, port
        self.paused = False
        self._gen_lock = threading.Lock()
        self._rng = jax.random.key(0)
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self._treedef = None
        self._paged_engines: dict = {}  # (gen-cfg, routing, max_len) -> AsyncPagedEngine
        self._metrics = {"requests": 0, "generated_tokens": 0,
                         "prompt_tokens": 0, "stream_requests": 0}

    # ------------------------------------------------------------------
    @property
    def base_url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> str:
        handler = _make_handler(self)
        self._server = ThreadingHTTPServer((self.host, self.port), handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        logger.info(f"rollout worker serving at {self.base_url}")
        return self.base_url

    def stop(self) -> None:
        for eng in list(self._paged_engines.values()):
            eng.stop()
        self._paged_engines.clear()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    # ------------------------------------------------------------------
    def update_weights(self, path: Optional[str] = None, version: Optional[int] = None) -> int:
        """Filesystem reload or colocate version acknowledgement."""
        if path is not None:
            import json as _json
            from pathlib import Path as _Path

            from .transport import FilesystemTransport, SharedMemoryTransport

            if self._treedef is None:
                params, _ = self.store.get()
                if params is None:
                    # build the treedef from specs without initializing
                    from ..module.params import init_params  # noqa: F401

                    raise RuntimeError("worker has no params to derive a treedef from; "
                                       "seed it with initial params first")
                self._treedef = jax.tree.structure(params)
            # sniff the transport kind from the latest marker: .bin = shm raw
            # segment (zero-copy mmap), .npz = filesystem snapshot
            marker = _json.loads((_Path(path) / "latest").read_text())
            cls = (SharedMemoryTransport if marker["path"].endswith(".bin")
                   else FilesystemTransport)
            params, ver = cls(path).fetch(self._treedef)
            self.store.set(params, ver)
            self._flush_prefix_caches()
            return ver
        if version is not None:
            # colocate: params were swapped in the shared store by the trainer
            self._flush_prefix_caches()
            return self.store.version
        raise ValueError("update_weights needs `path` or `version`")

    def _flush_prefix_caches(self) -> None:
        """New weights invalidate every engine's retained prefix KV."""
        for eng in self._paged_engines.values():
            eng.pg.request_prefix_flush()

    # ------------------------------------------------------------------
    def chat_complete(self, req: dict[str, Any]) -> dict[str, Any]:
        """OpenAI /v1/chat/completions: render `messages` through the
        worker's chat template, decode choices back to text (the standalone
        `xtuner-tpu serve` surface; the reference points users at lmdeploy/
        vLLM servers for this)."""
        if self.tokenizer is None or self.chat_template is None:
            raise ValueError("/v1/chat/completions needs a tokenizer and a "
                             "chat_template on the worker")
        from ..data_proto.templates import get_chat_template

        t = get_chat_template(self.chat_template)
        text = ""
        sys_msgs = [m for m in req.get("messages", []) if m.get("role") == "system"]
        if sys_msgs:
            text += t.system.format(system=sys_msgs[0]["content"])
        elif t.default_system:
            text += t.system.format(system=t.default_system)
        for m in req.get("messages", []):
            if m["role"] == "user":
                text += t.user.format(user=m["content"])
            elif m["role"] == "assistant":
                text += t.assistant.format(assistant=m["content"])
        out = self.complete({**req, "prompt": text})
        end_marker = t.assistant.format(assistant="").strip()  # e.g. <|im_end|>
        for ch in out["choices"]:
            raw = self.tokenizer.decode(ch.pop("token_ids"))
            if end_marker:
                raw = raw.split(end_marker)[0]
            ch["message"] = {"role": "assistant", "content": raw}
        out["object"] = "chat.completion"
        return out

    def _resolve_prompts(self, req: dict[str, Any]) -> list[list[int]]:
        if "prompt_ids" in req:
            prompt_lists = req["prompt_ids"]
            if prompt_lists and isinstance(prompt_lists[0], int):
                prompt_lists = [prompt_lists]
            return prompt_lists
        if self.tokenizer is None:
            raise ValueError("text prompt requires a tokenizer on the worker")
        texts = req.get("prompt", "")
        texts = [texts] if isinstance(texts, str) else texts
        return [self.tokenizer.encode(t, add_special_tokens=False)
                for t in texts]

    def _merge_gen_cfg(self, req: dict[str, Any]):
        # map OpenAI/SampleParams names -> GenerateConfig names
        upd = {}
        if "max_tokens" in req:
            upd["max_new_tokens"] = int(req["max_tokens"])
        for k in ("temperature", "top_p", "top_k", "repetition_penalty",
                  "presence_penalty", "frequency_penalty", "min_tokens",
                  "stop_token_ids", "top_logprobs"):
            if k in req:
                upd[k] = req[k]
        if "logit_bias" in req:  # JSON object keys arrive as strings
            upd["logit_bias"] = {int(k): float(v)
                                 for k, v in req["logit_bias"].items()}
        return self.gen_defaults.model_copy(update=upd)

    def _stop_seqs(self, req: dict[str, Any]) -> list[list[int]]:
        """OpenAI `stop` strings -> token-id sequences (paged early stop)."""
        stops = req.get("stop")
        if not stops or self.tokenizer is None:
            return []
        stops = [stops] if isinstance(stops, str) else list(stops)
        out = []
        for t in stops:
            ids = self.tokenizer.encode(t, add_special_tokens=False)
            if ids:
                out.append(list(ids))
        return out

    def complete(self, req: dict[str, Any]) -> dict[str, Any]:
        """One /v1/completions request (token-ids native; text via tokenizer)."""
        if self.paused:
            raise PausedError()
        params, version = self.store.get()
        if params is None:
            raise RuntimeError("rollout worker has no weights yet")

        prompt_lists = self._resolve_prompts(req)
        n = int(req.get("n", 1))
        self._metrics["requests"] += 1
        self._metrics["prompt_tokens"] += sum(len(p) for p in prompt_lists)
        rows = [p for p in prompt_lists for _ in range(n)]
        p_max = max(len(p) for p in rows)
        arr = np.full((len(rows), p_max), self.pad_token_id, np.int32)
        for i, p in enumerate(rows):
            arr[i, p_max - len(p):] = p  # left padding

        g = self._merge_gen_cfg(req)

        from ..model.paged_generate import paged_eligible
        from .spans import span

        # the paged engine carries the full sampling-state surface
        # (penalties via device-resident seen/count rows, min_tokens,
        # top_logprobs, stop ids/sequences, logit_bias)
        use_paged = (g.engine == "paged"
                     or (g.engine == "auto"
                         and paged_eligible(self.model_cfg)))
        if use_paged:
            # no lock: the async engine loop serializes device access, so
            # CONCURRENT requests share one batched decode (late arrivals
            # ride along with in-flight slots — model/async_engine.py)
            with span("rollout.generate", rows=len(rows), engine="paged"):
                with self._gen_lock:
                    self._rng, rng = jax.random.split(self._rng)
                out = self._complete_paged(params, prompt_lists, n, g, rng, req)
        else:
            with self._gen_lock, span("rollout.generate", rows=len(rows),
                                      engine="dense"):
                self._rng, rng = jax.random.split(self._rng)
                out = generate(self.model, params, arr, g, rng=rng,
                               compute_dtype=self.compute_dtype,
                               pad_token_id=self.pad_token_id,
                               return_logprobs=bool(req.get("logprobs", True)),
                               record_routing=bool(req.get("return_routing")))
        eos = g.eos_token_id if g.eos_token_id is not None else self.model_cfg.eos_token_id
        choices = []
        for i in range(len(rows)):
            toks = out["generated"][i].tolist()
            if "n_resp" in out:  # paged engine reports truth directly
                n_resp = out["n_resp"][i]
                finish = out["finish"][i]
            elif eos in toks:
                n_resp = toks.index(eos) + 1
                finish = "stop"
            else:
                n_resp = len(toks)
                finish = "length"
            self._metrics["generated_tokens"] += n_resp
            choice: dict[str, Any] = {
                "index": i,
                "token_ids": toks[:n_resp],
                "finish_reason": finish,
            }
            if "logprobs" in out:
                choice["logprobs"] = {
                    "token_logprobs": [float(x) for x in out["logprobs"][i][:n_resp]]}
                if "top_logprobs" in out:
                    choice["logprobs"]["top_logprobs"] = [
                        {int(t): float(v) for t, v in
                         zip(out["top_logprob_ids"][i][j], out["top_logprobs"][i][j])}
                        for j in range(n_resp)]
            if self.tokenizer is not None:
                stripped = toks[:n_resp]
                if finish == "stop" and stripped and stripped[-1] == eos:
                    stripped = stripped[:-1]
                text = self.tokenizer.decode(stripped)
                stops = req.get("stop")
                for st in ([stops] if isinstance(stops, str) else stops or []):
                    cut = text.find(st)
                    if cut >= 0:
                        text = text[:cut]
                choice["text"] = text
            if "routed_experts" in out and req.get("return_routing"):
                choice["routed_experts"] = np.asarray(
                    out["routed_experts"][i][:n_resp]).tolist()
            choices.append(choice)
        return {"object": "text_completion", "model": req.get("model", "default"),
                "policy_version": version, "choices": choices}


    # ------------------------------------------------------------------
    def _get_paged_engine(self, params, prompt_lists, g, rng, record: bool):
        """Resolve (or build) the AsyncPagedEngine for this gen-cfg/shape
        and return it with a call id that keeps prefix-sharing groups
        unique across concurrent HTTP calls."""
        from ..model.async_engine import AsyncPagedEngine
        from ..model.paged_generate import PagedGenerator

        n_new = g.max_new_tokens
        p_max = max((len(p) for p in prompt_lists), default=1)
        bs = g.paged_block_size
        bucket = -(-p_max // PagedGenerator.PREFILL_BUCKET) * PagedGenerator.PREFILL_BUCKET
        max_len = -(-(bucket + n_new) // bs) * bs
        # STRUCTURAL key only: numeric sampling params ride as traced
        # per-slot rows inside one compiled program (paged_generate.py
        # _sample_rows), so temperature/top_p/penalty-strength changes
        # never fragment the engine cache (a remote recompile costs
        # minutes); only the coarse class bits specialize
        from ..model.generate import penalties_active
        from ..model.paged_generate import ROW_PARAM_DEFAULTS

        cls_bits = (bool(g.do_sample and g.temperature != 0.0),
                    g.top_k > 0 or g.top_p < 1.0,
                    penalties_active(g), g.min_tokens > 0)
        structural = g.model_copy(update={
            **ROW_PARAM_DEFAULTS, "max_new_tokens": 0,
            # re-encode the class a normalized cfg must compile for
            "do_sample": cls_bits[0],
            "temperature": 1.0 if cls_bits[0] else 0.0,
            "top_k": 2 if cls_bits[1] else 0,
            "repetition_penalty": 2.0 if cls_bits[2] else 1.0,
            "min_tokens": 1 if cls_bits[3] else 0,
        }).model_dump_json()
        with self._gen_lock:  # engine creation only; submits are lock-free
            # Reuse the smallest engine that fits (same structural config,
            # capacity >= needed): per-exact-length engines would fragment
            # compile caches, duplicate KV pools, AND split the prefix cache
            # across pools (a multi-turn chat's growing prompt would land on
            # a fresh engine each turn and never hit). New engines snap to a
            # power-of-two length ladder so turn-over-turn growth stays on
            # one engine.
            eng = None
            for (s, r, ml), cand in self._paged_engines.items():
                if s == structural and r == record and ml >= max_len:
                    if eng is None or ml < eng[0]:
                        eng = (ml, cand)
            eng = eng[1] if eng is not None else None
            if eng is None:
                ladder = 256
                while ladder < max_len:
                    ladder *= 2
                ladder = -(-ladder // bs) * bs
                pg = PagedGenerator(
                    self.model, params,
                    g.model_copy(update={"max_length": ladder}),
                    max_batch=g.paged_max_batch, block_size=bs,
                    compute_dtype=self.compute_dtype,
                    pad_token_id=self.pad_token_id,
                    record_routing=record, rng=rng)
                eng = AsyncPagedEngine(pg)
                eng._params_version = self.store.version
                self._paged_engines[(structural, record, ladder)] = eng
            eng.pg.params = params
            # backstop for colocate swaps that skip /update_weights: a store
            # version change means the engine's retained prefix KV is stale
            if getattr(eng, "_params_version", None) != self.store.version:
                eng.pg.request_prefix_flush()
                eng._params_version = self.store.version
            call_id = self._call_counter = getattr(self, "_call_counter", 0) + 1
        return eng, call_id

    def stream_complete(self, req: dict[str, Any], chat: bool = False):
        """Streaming completion: yields OpenAI-style SSE `data:` payload
        dicts per token, then a final finish event (handler adds the SSE
        framing + [DONE]). Single prompt, n=1, paged engine only."""
        if self.paused:
            raise PausedError()
        params, _ = self.store.get()
        if params is None:
            raise RuntimeError("rollout worker has no weights yet")
        prompt_lists = self._resolve_prompts(req)
        self._metrics["stream_requests"] += 1
        if len(prompt_lists) != 1 or int(req.get("n", 1)) != 1:
            raise ValueError("stream=true supports a single prompt with n=1")
        g = self._merge_gen_cfg(req)

        from ..model.generate import penalties_active
        from ..model.paged_generate import paged_eligible

        if g.top_logprobs > 0 or not paged_eligible(self.model_cfg):
            raise ValueError("stream=true requires top_logprobs=0 and a "
                             "paged-eligible model")
        with self._gen_lock:
            self._rng, rng = jax.random.split(self._rng)
        eng, call_id = self._get_paged_engine(params, prompt_lists, g, rng,
                                              record=False)
        import queue as _queue

        from ..model.paged_generate import ROW_PARAM_DEFAULTS

        q: "_queue.Queue" = _queue.Queue()
        stop_seqs = self._stop_seqs(req)
        fut = eng.submit({"prompt_ids": prompt_lists[0],
                          "group": (call_id, 0),
                          "max_new_tokens": g.max_new_tokens,
                          **{k: getattr(g, k) for k in ROW_PARAM_DEFAULTS},
                          **({"_stop_seqs": stop_seqs} if stop_seqs else {})},
                         on_token=lambda t, lp: q.put((t, lp)))
        fut.add_done_callback(lambda f: q.put(None))
        eos = (g.eos_token_id if g.eos_token_id is not None
               else self.model_cfg.eos_token_id)
        emitted_text = ""
        toks: list[int] = []
        while True:
            item = q.get(timeout=600)
            if item is None:
                break
            t, lp = item
            if t == eos:
                continue  # eos never surfaces as content
            toks.append(t)
            ev: dict[str, Any] = {"index": 0, "logprob": lp}
            if self.tokenizer is not None:
                # suffix-diff decode: BPE pieces only become text once the
                # boundary resolves, so decode-all-and-diff
                full = self.tokenizer.decode(toks)
                delta, emitted_text = full[len(emitted_text):], full
                if chat:
                    ev["delta"] = {"content": delta}
                else:
                    ev["text"] = delta
            ev["token_id"] = t
            yield ev
        out = fut.result()  # re-raise engine errors
        finish = "stop" if eos in out["token_ids"] else "length"
        yield {"index": 0, "finish_reason": finish,
               **({"delta": {}} if chat else {"text": ""})}

    def _complete_paged(self, params, prompt_lists, n: int, g, rng, req) -> dict:
        """Paged continuous-batching rollout (model/paged_generate.py):
        requests queue into fixed decode slots, same-prompt groups share
        prompt blocks. Returns the dense-engine output dict shape."""
        record = bool(req.get("return_routing"))
        n_new = g.max_new_tokens
        eng, call_id = self._get_paged_engine(params, prompt_lists, g, rng,
                                              record=record)
        from ..model.paged_generate import ROW_PARAM_DEFAULTS

        stop_seqs = self._stop_seqs(req)
        row_vals = {k: getattr(g, k) for k in ROW_PARAM_DEFAULTS}
        requests = [{"prompt_ids": p, "group": (call_id, gi),
                     "max_new_tokens": n_new, **row_vals,
                     **({"_stop_seqs": stop_seqs} if stop_seqs else {})}
                    for gi, p in enumerate(prompt_lists) for _ in range(n)]
        outs = eng.generate(requests)

        eos = (g.eos_token_id if g.eos_token_id is not None
               else self.model_cfg.eos_token_id)
        b = len(outs)
        generated = np.full((b, n_new), eos, np.int32)
        lps = np.zeros((b, n_new), np.float32)
        out: dict[str, Any] = {}
        routed = None
        for i, o in enumerate(outs):
            toks = o["token_ids"][:n_new]
            generated[i, :len(toks)] = toks
            lps[i, :len(toks)] = o["logprobs"][:n_new]
            if record and "routed_experts" in o:
                r = np.asarray(o["routed_experts"])  # (Ni, nL, K)
                if routed is None:
                    routed = np.zeros((b, n_new, *r.shape[1:]), np.int32)
                routed[i, :r.shape[0]] = r[:n_new]
        out["generated"] = generated
        # true per-row lengths + reasons: eos-padding alone cannot recover
        # them (a stop-sequence finish has no real eos)
        out["n_resp"] = [min(len(o["token_ids"]), n_new) for o in outs]
        out["finish"] = [o["finish_reason"] for o in outs]
        if g.top_logprobs > 0 and outs and "top_logprob_ids" in outs[0]:
            k = g.top_logprobs
            tids = np.zeros((b, n_new, k), np.int32)
            tlps = np.zeros((b, n_new, k), np.float32)
            for i, o in enumerate(outs):
                m = min(len(o["top_logprob_ids"]), n_new)
                tids[i, :m] = o["top_logprob_ids"][:m]
                tlps[i, :m] = o["top_logprobs"][:m]
            out["top_logprob_ids"] = tids
            out["top_logprobs"] = tlps
        if req.get("logprobs", True):
            out["logprobs"] = lps
        if routed is not None:
            out["routed_experts"] = routed
        return out


class PausedError(RuntimeError):
    pass


def _make_handler(worker: RolloutWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence default stderr access log
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_sse(self, events) -> None:
            """OpenAI-style SSE stream: one `data: {json}` frame per event,
            then `data: [DONE]`. Connection: close (no chunked framing
            needed on HTTP/1.1 with an explicit close)."""
            # prime the generator BEFORE sending headers so validation
            # errors (bad params, paused) surface as real HTTP errors
            it = iter(events)
            try:
                first = next(it)
            except StopIteration:
                first = None

            def _chain():
                if first is not None:
                    yield first
                yield from it

            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                for ev in _chain():
                    self.wfile.write(
                        b"data: " + json.dumps({"choices": [ev]}).encode()
                        + b"\n\n")
                    self.wfile.flush()
            except Exception as e:  # headers already sent: error as a frame
                logger.error(f"stream error: {e!r}")
                self.wfile.write(
                    b"data: " + json.dumps({"error": repr(e)}).encode()
                    + b"\n\n")
            finally:
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "paused" if worker.paused else "ok",
                                 "version": worker.store.version})
            elif self.path == "/metrics":
                # Prometheus text format: serving counters + live engine
                # state (slot occupancy, queue depth, cache blocks free)
                m = dict(worker._metrics)
                lines = [f"xtuner_{k} {v}" for k, v in m.items()]
                for i, (key, eng) in enumerate(worker._paged_engines.items()):
                    pg = eng.pg
                    live = sum(not s.done for s in pg.slots)
                    with eng._cv:
                        qd = len(eng._queue) + len(eng._futures) - live
                    lines.append(
                        f'xtuner_engine_slots_live{{engine="{i}"}} {live}')
                    lines.append(
                        f'xtuner_engine_slots_total{{engine="{i}"}} '
                        f"{len(pg.slots)}")
                    lines.append(
                        f'xtuner_engine_queue_depth{{engine="{i}"}} '
                        f"{max(qd, 0)}")
                    lines.append(
                        f'xtuner_engine_blocks_free{{engine="{i}"}} '
                        f"{pg.cache.allocator.free_blocks}")
                    if pg.prefix_cache is not None:
                        pc = pg.prefix_cache
                        for k, v in (("lookups", pc.lookups),
                                     ("hits", pc.hits),
                                     ("cached_tokens", pc.cached_tokens),
                                     ("blocks", len(pc))):
                            lines.append(
                                f'xtuner_prefix_cache_{k}{{engine="{i}"}} '
                                f"{v}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            try:
                if self.path == "/v1/completions" and req.get("stream"):
                    self._send_sse(worker.stream_complete(req, chat=False))
                elif self.path == "/v1/completions":
                    self._send(200, worker.complete(req))
                elif self.path == "/v1/chat/completions" and req.get("stream"):
                    from ..data_proto.templates import get_chat_template

                    if worker.chat_template is None:
                        raise ValueError("streaming chat needs chat_template")
                    t = get_chat_template(worker.chat_template)
                    text = ""
                    msgs = req.get("messages", [])
                    sys_msgs = [m for m in msgs if m.get("role") == "system"]
                    if sys_msgs:
                        text += t.system.format(system=sys_msgs[0]["content"])
                    elif t.default_system:
                        text += t.system.format(system=t.default_system)
                    for m in msgs:
                        if m["role"] == "user":
                            text += t.user.format(user=m["content"])
                        elif m["role"] == "assistant":
                            text += t.assistant.format(assistant=m["content"])
                    self._send_sse(worker.stream_complete(
                        {**req, "prompt": text}, chat=True))
                elif self.path == "/v1/chat/completions":
                    self._send(200, worker.chat_complete(req))
                elif self.path == "/pause":
                    worker.paused = True
                    self._send(200, {"status": "paused"})
                elif self.path == "/resume":
                    worker.paused = False
                    self._send(200, {"status": "ok"})
                elif self.path == "/update_weights":
                    ver = worker.update_weights(req.get("path"), req.get("version"))
                    self._send(200, {"status": "ok", "version": ver})
                else:
                    self._send(404, {"error": "not found"})
            except PausedError:
                self._send(409, {"error": "worker paused"})
            except Exception as e:  # surface errors to the client
                logger.error(f"rollout worker error: {e!r}")
                self._send(500, {"error": repr(e)})

    return Handler
