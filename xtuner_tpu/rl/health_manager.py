"""Rollout worker registry + health manager.

Reference: xtuner/v1/rl/rollout/health_manager.py:37-174 (periodic worker
probing, consecutive-failure threshold, dead-worker callbacks and restart
hooks) and the controller's worker registry (rollout/worker registry used by
the disaggregated trainer). One thread pings every registered worker's
/health; `route()` round-robins across live workers only.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..utils.logger import get_logger

logger = get_logger()


@dataclass
class WorkerState:
    url: str
    alive: bool = True
    consecutive_failures: int = 0
    last_ok: float = 0.0
    version: int = -1
    meta: dict = field(default_factory=dict)
    # on_dead fired for this worker (guards double-restarts when request
    # failover already flipped `alive` before the probes confirmed death)
    dead_handled: bool = False


class WorkerRegistry:
    """Round-robin registry over live workers (controller analog)."""

    def __init__(self):
        self._workers: dict[str, WorkerState] = {}
        self._lock = threading.Lock()
        self._rr = 0

    def register(self, url: str, **meta) -> None:
        with self._lock:
            self._workers[url] = WorkerState(url=url, meta=meta)

    def unregister(self, url: str) -> None:
        with self._lock:
            self._workers.pop(url, None)

    def states(self) -> list[WorkerState]:
        with self._lock:
            return list(self._workers.values())

    def live(self) -> list[WorkerState]:
        return [w for w in self.states() if w.alive]

    def route(self) -> WorkerState:
        live = self.live()
        if not live:
            raise RuntimeError("no live rollout workers")
        with self._lock:
            self._rr = (self._rr + 1) % len(live)
            return live[self._rr]


class HealthManager:
    def __init__(self, registry: WorkerRegistry, interval: float = 5.0,
                 failure_threshold: int = 3, timeout: float = 5.0,
                 on_dead: Optional[Callable[[WorkerState], None]] = None):
        self.registry = registry
        self.interval = interval
        self.failure_threshold = failure_threshold
        self.timeout = timeout
        self.on_dead = on_dead
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def probe(self, w: WorkerState) -> bool:
        try:
            with urllib.request.urlopen(w.url.rstrip("/") + "/health",
                                        timeout=self.timeout) as resp:
                info = json.loads(resp.read())
            w.version = int(info.get("version", -1))
            return True
        except Exception:
            return False

    def check_once(self) -> None:
        for w in self.registry.states():
            if self.probe(w):
                w.consecutive_failures = 0
                w.last_ok = time.time()
                if not w.alive:
                    logger.info(f"rollout worker {w.url} recovered")
                w.alive = True
                w.dead_handled = False
            else:
                w.consecutive_failures += 1
                if w.consecutive_failures >= self.failure_threshold \
                        and not w.dead_handled:
                    # note: `alive` may already be False (request failover
                    # marks it immediately); on_dead must still fire exactly
                    # once so the restart path runs
                    w.alive = False
                    w.dead_handled = True
                    logger.warning(
                        f"rollout worker {w.url} marked DEAD after "
                        f"{w.consecutive_failures} failed probes")
                    if self.on_dead is not None:
                        self.on_dead(w)

    def start(self) -> None:
        def loop():
            while not self._stop.wait(self.interval):
                self.check_once()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
