"""Standalone-HTML renderer for the rollout trace viewer (reference:
recipe/trace/viewer/render.py — Jaeger-backed HTML; here a zero-dependency
page over the local payloads).

One self-contained document: reward-vs-step line (single series — titled, no
legend box), span waterfall (bars colored by phase: rollout / train / other —
three categorical slots, legend + name labels in ink so identity is never
color-alone), span summary + step tables as the table view. Light/dark via
CSS custom properties with `prefers-color-scheme`; palette/ink roles follow
docs' validated defaults (series blue #2a78d6/#3987e5, orange, aqua)."""

from __future__ import annotations

import html
import json
from typing import Any

_CSS = """
:root { color-scheme: light dark; }
body {
  margin: 0; padding: 24px; font: 13px/1.5 system-ui, -apple-system, "Segoe UI", sans-serif;
  background: var(--page); color: var(--ink);
  --page: #f9f9f7; --surface: #fcfcfb; --ink: #0b0b0b; --ink-2: #52514e;
  --muted: #898781; --grid: #e1e0d9; --axis: #c3c2b7;
  --s1: #2a78d6; --s2: #eb6834; --s3: #1baf7a;
  --ring: rgba(11,11,11,0.10);
}
@media (prefers-color-scheme: dark) { body {
  --page: #0d0d0d; --surface: #1a1a19; --ink: #ffffff; --ink-2: #c3c2b7;
  --muted: #898781; --grid: #2c2c2a; --axis: #383835;
  --s1: #3987e5; --s2: #d95926; --s3: #199e70;
  --ring: rgba(255,255,255,0.10);
}}
h1 { font-size: 16px; margin: 0 0 4px; } h2 { font-size: 14px; margin: 24px 0 8px; }
.sub { color: var(--ink-2); margin-bottom: 16px; }
.card { background: var(--surface); border: 1px solid var(--ring); border-radius: 8px;
        padding: 16px; margin-bottom: 16px; }
table { border-collapse: collapse; width: 100%; }
th { text-align: left; color: var(--muted); font-weight: 500; border-bottom: 1px solid var(--axis);
     padding: 4px 12px 4px 0; }
td { padding: 4px 12px 4px 0; border-bottom: 1px solid var(--grid);
     font-variant-numeric: tabular-nums; }
td.t { font-variant-numeric: normal; }
.bar { fill: var(--s1); rx: 2px; } .bar.train { fill: var(--s2); } .bar.other { fill: var(--s3); }
.legend { display: flex; gap: 16px; margin: 8px 0; color: var(--ink-2); }
.legend span::before { content: ""; display: inline-block; width: 10px; height: 10px;
  border-radius: 3px; margin-right: 6px; vertical-align: -1px; }
.legend .l1::before { background: var(--s1); } .legend .l2::before { background: var(--s2); }
.legend .l3::before { background: var(--s3); }
.spanname { fill: var(--ink); font-size: 11px; }
.axisline { stroke: var(--axis); } .gridline { stroke: var(--grid); }
.ticklabel { fill: var(--muted); font-size: 10px; }
details > summary { cursor: pointer; color: var(--ink-2); }
pre { white-space: pre-wrap; background: var(--page); padding: 8px; border-radius: 6px; }
"""


def _fmt(x: Any, nd: int = 3) -> str:
    if x is None:
        return "—"
    if isinstance(x, float):
        return f"{x:.{nd}f}"
    return str(x)


def render_reward_svg(steps: list[dict], width: int = 720, height: int = 180) -> str:
    """Single-series reward_mean polyline with point markers (native title
    tooltips) over hairline gridlines."""
    if not steps:
        return "<p class='sub'>no rollout traces recorded</p>"
    pad_l, pad_r, pad_t, pad_b = 44, 12, 8, 22
    xs = [s["step"] for s in steps]
    ys = [s["reward_mean"] for s in steps]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys + [0.0]), max(ys + [1e-9])
    if y1 - y0 < 1e-9:
        y1 = y0 + 1.0
    sx = lambda x: pad_l + (x - x0) / max(x1 - x0, 1e-9) * (width - pad_l - pad_r)
    sy = lambda y: pad_t + (1 - (y - y0) / (y1 - y0)) * (height - pad_t - pad_b)
    parts = [f'<svg viewBox="0 0 {width} {height}" role="img" '
             f'aria-label="mean reward per training step" width="100%">']
    for frac in (0.0, 0.5, 1.0):
        yv = y0 + frac * (y1 - y0)
        parts.append(f'<line class="gridline" x1="{pad_l}" x2="{width - pad_r}" '
                     f'y1="{sy(yv):.1f}" y2="{sy(yv):.1f}"/>')
        parts.append(f'<text class="ticklabel" x="{pad_l - 6}" y="{sy(yv) + 3:.1f}" '
                     f'text-anchor="end">{yv:.2f}</text>')
    parts.append(f'<line class="axisline" x1="{pad_l}" x2="{width - pad_r}" '
                 f'y1="{sy(y0):.1f}" y2="{sy(y0):.1f}"/>')
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
    parts.append(f'<polyline points="{pts}" fill="none" stroke="var(--s1)" '
                 'stroke-width="2" stroke-linejoin="round"/>')
    for s, x, y in zip(steps, xs, ys):
        parts.append(
            f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="4" fill="var(--s1)">'
            f'<title>step {x}: mean {y:.4f} (min {s["reward_min"]:.3f}, '
            f'max {s["reward_max"]:.3f}, n={s["n_samples"]})</title></circle>')
        parts.append(f'<text class="ticklabel" x="{sx(x):.1f}" y="{height - 6}" '
                     f'text-anchor="middle">{x}</text>')
    parts.append("</svg>")
    return "".join(parts)


def render_waterfall_svg(wf: dict, width: int = 720, row_h: int = 18) -> str:
    spans = wf.get("spans", [])
    if not spans:
        return "<p class='sub'>no spans recorded (configure_spans not enabled)</p>"
    total = max(wf.get("total_s") or 0.0, 1e-9)
    label_w, pad_r = 220, 12
    plot_w = width - label_w - pad_r
    height = len(spans) * row_h + 24
    parts = [f'<svg viewBox="0 0 {width} {height}" role="img" '
             f'aria-label="span waterfall" width="100%">']
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        x = label_w + frac * plot_w
        parts.append(f'<line class="gridline" x1="{x:.1f}" x2="{x:.1f}" y1="0" '
                     f'y2="{height - 16}"/>')
        parts.append(f'<text class="ticklabel" x="{x:.1f}" y="{height - 4}" '
                     f'text-anchor="middle">{frac * total:.2f}s</text>')
    for i, s in enumerate(spans):
        y = i * row_h + 2
        x = label_w + s["offset_s"] / total * plot_w
        w = max(s["dur_s"] / total * plot_w, 2.0)
        cls = ("train" if s["phase"] == "train"
               else "" if s["phase"] == "rollout" else "other")
        name = html.escape(s["name"])
        indent = 10 * min(s["depth"], 8)
        parts.append(f'<text class="spanname" x="{4 + indent}" y="{y + row_h - 7}">'
                     f'{name}</text>')
        parts.append(f'<rect class="bar {cls}" x="{x:.1f}" y="{y}" width="{w:.1f}" '
                     f'height="{row_h - 6}" rx="2">'
                     f'<title>{name}: {s["dur_s"]:.4f}s @ +{s["offset_s"]:.4f}s '
                     f'({html.escape(str(s.get("thread") or ""))})</title></rect>')
    parts.append("</svg>")
    note = (f"<p class='sub'>{wf['truncated']} more spans truncated</p>"
            if wf.get("truncated") else "")
    return "".join(parts) + note


def render_overview(ov: dict, wf: dict) -> str:
    steps_rows = "".join(
        f"<tr><td><a href='/step/{s['step']}'>{s['step']}</a></td>"
        f"<td>{s['n_prompts']}</td><td>{s['n_samples']}</td>"
        f"<td>{_fmt(s['reward_mean'])}</td><td>{_fmt(s['reward_min'])}</td>"
        f"<td>{_fmt(s['reward_max'])}</td><td>{_fmt(s['mean_response_len'], 1)}</td></tr>"
        for s in ov["steps"])
    span_rows = "".join(
        f"<tr><td class='t'>{html.escape(r['name'])}</td><td>{r['count']:.0f}</td>"
        f"<td>{_fmt(r['total_s'])}</td><td>{_fmt(r['avg_s'])}</td>"
        f"<td>{_fmt(r['max_s'])}</td></tr>"
        for r in ov["span_summary"])
    imb = ov.get("imbalance")
    imb_txt = ("n/a" if imb is None else
               f"{imb:.2f} ({'rollout-bound' if imb > 1 else 'train-bound'})")
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>xtuner-tpu trace viewer</title><style>{_CSS}</style></head><body>
<h1>xtuner-tpu rollout trace viewer</h1>
<div class="sub">{html.escape(ov["work_dir"])} · rollout/train imbalance: {imb_txt}</div>
<div class="card"><h2>mean reward per step</h2>{render_reward_svg(ov["steps"])}
<table><tr><th>step</th><th>prompts</th><th>samples</th><th>reward mean</th>
<th>min</th><th>max</th><th>resp len</th></tr>{steps_rows}</table></div>
<div class="card"><h2>span waterfall</h2>
<div class="legend"><span class="l1">rollout</span><span class="l2">train</span>
<span class="l3">other</span></div>
{render_waterfall_svg(wf)}
<h2>span summary</h2>
<table><tr><th>span</th><th>count</th><th>total s</th><th>avg s</th><th>max s</th></tr>
{span_rows}</table></div>
</body></html>"""


def render_step(payload: dict) -> str:
    cards = []
    for g in payload["groups"]:
        rows = "".join(
            f"<tr><td>{s['sample_index']}</td><td>{_fmt(s['reward'])}</td>"
            f"<td>{_fmt(s['advantage'])}</td><td>{s['n_prompt_tokens']}</td>"
            f"<td>{s['n_response_tokens']}</td><td>{_fmt(s['mean_logprob'])}</td></tr>"
            for s in g["samples"])
        texts = "".join(
            f"<details><summary>sample {s['sample_index']} "
            f"(reward {_fmt(s['reward'])})</summary>"
            f"<pre>{html.escape(s['response_text'] or '(no text captured)')}</pre></details>"
            for s in g["samples"])
        cards.append(
            f"<div class='card'><h2>prompt {g['prompt_id']} · policy v"
            f"{g['policy_version']} · mean reward {_fmt(g['reward_mean'])}</h2>"
            f"<table><tr><th>sample</th><th>reward</th><th>advantage</th>"
            f"<th>prompt toks</th><th>resp toks</th><th>mean logprob</th></tr>"
            f"{rows}</table>{texts}</div>")
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>step {payload["step"]} — xtuner-tpu trace viewer</title>
<style>{_CSS}</style></head><body>
<h1><a href="/">← overview</a> · step {payload["step"]}</h1>
{"".join(cards) or "<p class='sub'>no records for this step</p>"}
</body></html>"""


def render_json(obj: Any) -> str:
    return json.dumps(obj)
