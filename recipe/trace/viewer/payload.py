"""Trace viewer payload builders (reference: recipe/trace/viewer/payload.py —
987 LoC that reconstruct rollout timelines from the Jaeger query API).

TPU redesign: no Jaeger/OTel stack to query — the runtime already persists
everything locally (SURVEY §5 tracing): per-step rollout shards from
:class:`xtuner_tpu.rl.trace.RolloutTraceStore` and phase spans from
:class:`xtuner_tpu.rl.spans.SpanTracer` (rl_spans.jsonl). These builders
aggregate a run's work_dir into the three JSON payloads the viewer renders:
run overview (reward curve + span summary + rollout/train imbalance), one
step's sample groups, and the span waterfall.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

from xtuner_tpu.rl.spans import read_spans
from xtuner_tpu.rl.trace import RolloutTraceStore


def _store(work_dir: str | Path) -> RolloutTraceStore:
    # enabled=False: read-only view, never create dirs in someone's run
    return RolloutTraceStore(work_dir, enabled=False)


def run_overview(work_dir: str | Path) -> dict[str, Any]:
    """Steps + per-step reward stats + span aggregate + imbalance."""
    store = _store(work_dir)
    steps = []
    for step in store.steps():
        recs = store.load_step(step)
        rewards = [r.get("reward", 0.0) for r in recs]
        if not rewards:
            continue
        steps.append({
            "step": step,
            "n_samples": len(recs),
            "n_prompts": len({r.get("prompt_id") for r in recs}),
            "reward_mean": sum(rewards) / len(rewards),
            "reward_min": min(rewards),
            "reward_max": max(rewards),
            "mean_response_len": sum(len(r.get("response_ids", [])) for r in recs) / len(recs),
        })
    spans = read_spans(work_dir)
    agg: dict[str, dict[str, float]] = {}
    for s in spans:
        a = agg.setdefault(s["name"], {"count": 0, "total_s": 0.0, "max_s": 0.0})
        a["count"] += 1
        a["total_s"] += s["dur_s"]
        a["max_s"] = max(a["max_s"], s["dur_s"])
    roll = sum(v["total_s"] for k, v in agg.items() if k.startswith("rollout."))
    train = sum(v["total_s"] for k, v in agg.items() if k.startswith("train."))
    return {
        "work_dir": str(work_dir),
        "steps": steps,
        "span_summary": [
            {"name": k, **{kk: round(vv, 6) for kk, vv in v.items()},
             "avg_s": round(v["total_s"] / max(v["count"], 1), 6)}
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1]["total_s"])],
        # >1: rollout-bound, <1: train-bound (the reference Jaeger view's
        # headline question)
        "imbalance": round(roll / train, 4) if train > 0 else None,
    }


def step_payload(work_dir: str | Path, step: int,
                 max_text_chars: int = 2000) -> dict[str, Any]:
    """One step's rollouts, grouped by prompt, GRPO-group stats attached."""
    store = _store(work_dir)
    by_prompt: dict[int, list[dict]] = {}
    for rec in store.load_step(step):
        by_prompt.setdefault(int(rec.get("prompt_id", -1)), []).append(rec)
    groups = []
    for pid, recs in sorted(by_prompt.items()):
        rewards = [r.get("reward", 0.0) for r in recs]
        groups.append({
            "prompt_id": pid,
            "policy_version": recs[0].get("policy_version"),
            "reward_mean": sum(rewards) / len(rewards),
            "samples": [{
                "sample_index": r.get("sample_index"),
                "reward": r.get("reward", 0.0),
                "advantage": r.get("advantage", 0.0),
                "n_prompt_tokens": len(r.get("prompt_ids", [])),
                "n_response_tokens": len(r.get("response_ids", [])),
                "response_text": (r.get("response_text") or "")[:max_text_chars],
                "mean_logprob": (sum(r["logprobs"]) / len(r["logprobs"])
                                 if r.get("logprobs") else None),
            } for r in recs],
        })
    return {"step": step, "groups": groups}


def span_waterfall(work_dir: str | Path,
                   max_spans: int = 500) -> dict[str, Any]:
    """Spans normalized to run-relative offsets, nesting depth resolved from
    parent ids — the Jaeger waterfall view's data, minus Jaeger."""
    spans = read_spans(work_dir)
    if not spans:
        return {"t0": None, "total_s": 0.0, "spans": [], "truncated": 0}
    t0 = min(s["start"] for s in spans)
    end = max(s["start"] + s["dur_s"] for s in spans)
    depth: dict[Optional[str], int] = {None: -1}
    rows = []
    for s in sorted(spans, key=lambda x: x["start"]):
        d = depth.get(s.get("parent_id"), -1) + 1
        depth[s["span_id"]] = d
        rows.append({
            "name": s["name"],
            "offset_s": round(s["start"] - t0, 6),
            "dur_s": s["dur_s"],
            "depth": d,
            "thread": s.get("thread"),
            "phase": s["name"].split(".", 1)[0],
            "attrs": {k: v for k, v in s.items()
                      if k not in ("name", "start", "dur_s", "span_id",
                                   "parent_id", "thread")},
        })
    truncated = max(0, len(rows) - max_spans)
    return {"t0": t0, "total_s": round(end - t0, 6),
            "spans": rows[:max_spans], "truncated": truncated}
