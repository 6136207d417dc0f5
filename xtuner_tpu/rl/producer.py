"""Async rollout producer with pause/resume and partial rollouts.

Reference: xtuner/v1/rl/agent_loop_manager/producer.py (:423 background
produce loop feeding the replay buffer), disagg_producer.py and
produce_utils.py (partial rollout: generation interrupted by a weight sync
resumes under the new policy, each chunk keeping the logprobs of the policy
that produced it — the truncated-IS correction in the loss handles the mix).

TPU redesign: one background thread drives `produce_fn(version) ->
list[SampleGroup]` into the ReplayBuffer; `pause()` drains the in-flight call
(generation on the chip is not preemptible mid-jit), the trainer syncs
weights, `resume(new_version)` reopens the gate. `ChunkedRollout` gives
partial-rollout semantics by splitting max_new_tokens into chunks and
re-checking the pause gate between chunks.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from ..utils.logger import get_logger
from .replay_buffer import ReplayBuffer, SampleGroup

logger = get_logger()


class AsyncProducer:
    def __init__(self, produce_fn: Callable[[int], list[SampleGroup]],
                 replay_buffer: ReplayBuffer, start_version: int = 0):
        self.produce_fn = produce_fn
        self.buffer = replay_buffer
        self.version = start_version
        self._gate = threading.Event()  # set = produce allowed
        self._gate.set()
        self._idle = threading.Event()  # set = no produce call in flight
        self._idle.set()
        self._stop = False
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None
        self._cond = threading.Condition()

    # ------------------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop = True
        self._gate.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def pause(self, timeout: float = 300.0) -> None:
        """Close the gate and wait for the in-flight produce call to drain
        (weight-sync window; reference pause before update_weights)."""
        self._gate.clear()
        if not self._idle.wait(timeout):
            raise TimeoutError("producer did not drain before weight sync")

    def resume(self, version: int) -> None:
        self.version = version
        self._gate.set()

    # ------------------------------------------------------------------
    def _loop(self) -> None:
        while not self._stop:
            if not self._gate.wait(timeout=0.5):
                continue
            if self._stop:
                break
            self._idle.clear()
            try:
                from .spans import span

                with span("rollout.produce", version=self.version):
                    groups = self.produce_fn(self.version)
                with self._cond:
                    for g in groups:
                        self.buffer.put(g)
                    self._cond.notify_all()
            except BaseException as e:  # propagate to the consumer
                self._error = e
                logger.error(f"producer failed: {e!r}")
                with self._cond:
                    self._cond.notify_all()
                return
            finally:
                self._idle.set()

    def get_batch(self, n_groups: int, current_step: int,
                  timeout: float = 600.0) -> list[SampleGroup]:
        """Blocking buffer read; raises the producer's error if it died
        (reference _get_batch_or_raise_producer_failure)."""
        deadline = time.time() + timeout
        with self._cond:
            while True:
                if self._error is not None:
                    raise RuntimeError("rollout producer failed") from self._error
                self.buffer.maybe_expire(current_step)
                if len(self.buffer) >= n_groups:
                    return self.buffer.get(n_groups)
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise TimeoutError(f"no rollout batch within {timeout}s")
                self._cond.wait(timeout=min(remaining, 1.0))


# ---------------------------------------------------------------------------
# partial rollouts
# ---------------------------------------------------------------------------
@dataclass
class PartialRollout:
    """A generation split into chunks, each tagged with the policy version
    that produced it (reference produce_utils.py partial-rollout records)."""

    prompt_ids: list[int]
    chunks: list[dict] = field(default_factory=list)  # {token_ids, logprobs, version}
    finished: bool = False

    @property
    def response_ids(self) -> list[int]:
        return [t for c in self.chunks for t in c["token_ids"]]

    @property
    def logprobs(self) -> list[float]:
        return [l for c in self.chunks for l in c["logprobs"]]

    @property
    def versions(self) -> list[int]:
        return [c["version"] for c in self.chunks for _ in c["token_ids"]]


def chunked_rollout(client_generate: Callable[..., dict], prompt_ids: list[int],
                    *, max_new_tokens: int, chunk_size: int, eos_token_id: int,
                    should_pause: Callable[[], bool] = lambda: False,
                    partial: Optional[PartialRollout] = None) -> PartialRollout:
    """Generate in chunks, re-feeding prompt+partial each chunk so a weight
    sync between chunks continues the SAME rollout under the new policy.

    client_generate(prompt_ids=..., max_tokens=...) must return one choice
    dict with token_ids / logprobs / policy_version (RolloutWorker wire
    format). Returns when finished, out of budget, or `should_pause()`.
    """
    pr = partial or PartialRollout(prompt_ids=list(prompt_ids))
    while not pr.finished:
        used = len(pr.response_ids)
        budget = max_new_tokens - used
        if budget <= 0:
            break
        if should_pause() and used > 0:
            break  # resume later under the new policy
        step = min(chunk_size, budget)
        resp = client_generate(prompt_ids=pr.prompt_ids + pr.response_ids,
                               max_tokens=step)
        choice = resp["choices"][0]
        toks = choice["token_ids"]
        lps = (choice.get("logprobs") or {}).get("token_logprobs", [0.0] * len(toks))
        pr.chunks.append({"token_ids": toks, "logprobs": lps,
                          "version": resp.get("policy_version", 0)})
        if toks and toks[-1] == eos_token_id:
            pr.finished = True
        if len(toks) < step:
            pr.finished = True
    return pr
