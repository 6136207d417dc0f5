"""RL runtime span tracing: per-phase wall-time spans for diagnosing
rollout/train imbalance.

Reference: xtuner/v1/rl/trace/runtime.py (an OpenTelemetry collector +
Jaeger-viewer stack, 583 LoC). TPU-native redesign: spans are plain records
written to a jsonl file — no collector process, no exporter deps, no
network — with a thread-local stack providing parent/child nesting and a
`summary()` aggregation that answers the question the reference's Jaeger UI
answers ("where did the step's wall time go: generate / judge / pack /
logprob recompute / train / weight sync?").

Usage:
    tracer = SpanTracer(work_dir)           # or configure_spans(work_dir)
    with tracer.span("rollout.generate", n_prompts=8):
        ...
    tracer.summary() -> {"rollout.generate": {"count": 3, "total_s": ...}}
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from pathlib import Path
from typing import Any, Optional

_local = threading.local()
_global_tracer: Optional["SpanTracer"] = None


class SpanTracer:
    def __init__(self, root: str | Path | None = None, enabled: bool = True):
        self.enabled = enabled
        self.path: Optional[Path] = None
        if root is not None and enabled:
            rootp = Path(root)
            rootp.mkdir(parents=True, exist_ok=True)
            self.path = rootp / "rl_spans.jsonl"
        self._lock = threading.Lock()
        self._agg: dict[str, dict[str, float]] = {}

    # ------------------------------------------------------------------
    def span(self, name: str, **attrs: Any) -> "_Span":
        return _Span(self, name, attrs)

    def _stack(self) -> list[str]:
        if not hasattr(_local, "stack"):
            _local.stack = []
        return _local.stack

    def _record(self, name: str, start: float, dur: float, span_id: str,
                parent: Optional[str], attrs: dict) -> None:
        with self._lock:
            agg = self._agg.setdefault(name, {"count": 0, "total_s": 0.0, "max_s": 0.0})
            agg["count"] += 1
            agg["total_s"] += dur
            agg["max_s"] = max(agg["max_s"], dur)
        if self.path is not None:
            rec = {"name": name, "start": start, "dur_s": round(dur, 6),
                   "span_id": span_id, "parent_id": parent,
                   "thread": threading.current_thread().name, **attrs}
            line = json.dumps(rec) + "\n"
            with self._lock:
                with self.path.open("a") as f:
                    f.write(line)

    # ------------------------------------------------------------------
    def summary(self) -> dict[str, dict[str, float]]:
        """Per-span-name aggregate: count / total_s / max_s / avg_s."""
        with self._lock:
            out = {}
            for name, agg in self._agg.items():
                out[name] = {**agg, "avg_s": agg["total_s"] / max(agg["count"], 1)}
            return out

    def imbalance(self) -> Optional[float]:
        """rollout wall time / train wall time — the headline disagg
        diagnostic (>1: rollout-bound, <1: train-bound)."""
        s = self.summary()
        roll = sum(v["total_s"] for k, v in s.items() if k.startswith("rollout."))
        train = sum(v["total_s"] for k, v in s.items() if k.startswith("train."))
        if train <= 0:
            return None
        return roll / train


class _Span:
    def __init__(self, tracer: SpanTracer, name: str, attrs: dict):
        self.tracer = tracer
        self.name = name
        self.attrs = attrs

    def __enter__(self):
        self.start = time.time()
        self.span_id = uuid.uuid4().hex[:12]
        stack = self.tracer._stack()
        self.parent = stack[-1] if stack else None
        stack.append(self.span_id)
        return self

    def __exit__(self, *exc):
        self.tracer._stack().pop()
        if self.tracer.enabled:
            self.tracer._record(self.name, self.start, time.time() - self.start,
                                self.span_id, self.parent, self.attrs)
        return False


def configure_spans(root: str | Path | None, enabled: bool = True) -> SpanTracer:
    """Install a process-global tracer (reference configure_trace analog)."""
    global _global_tracer
    _global_tracer = SpanTracer(root, enabled)
    return _global_tracer


def get_tracer() -> SpanTracer:
    global _global_tracer
    if _global_tracer is None:
        _global_tracer = SpanTracer(None, enabled=False)  # no-op until configured
    return _global_tracer


def span(name: str, **attrs: Any) -> _Span:
    """Convenience: a span on the global tracer."""
    return get_tracer().span(name, **attrs)


def read_spans(root: str | Path) -> list[dict]:
    p = Path(root) / "rl_spans.jsonl"
    if not p.exists():
        return []
    return [json.loads(x) for x in p.read_text().splitlines() if x]
