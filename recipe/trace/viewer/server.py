"""Rollout trace viewer HTTP server (reference: recipe/trace/viewer/server.py
— FastAPI app over the Jaeger query API; here a stdlib ThreadingHTTPServer
over the local jsonl trace stores, zero extra deps).

Routes:
    /                    overview page (reward curve, waterfall, tables)
    /step/<n>            one step's rollout groups + response texts
    /api/overview        JSON payloads (same data the pages render)
    /api/step/<n>
    /api/spans

Run:  python -m recipe.trace.viewer.server <work_dir> [--port 18080]
Port default + env override match the reference (XTUNER_TRACE_VIEWER_PORT,
reference recipe/trace/README.md "default viewer port is 18080").
"""

from __future__ import annotations

import argparse
import json
import os
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import payload, render

_STEP_RE = re.compile(r"^/(api/)?step/(\d+)$")


class TraceViewerHandler(BaseHTTPRequestHandler):
    work_dir: str = "."

    def log_message(self, fmt, *args):  # quiet: goes to the training log
        pass

    def _send(self, body: str, ctype: str, code: int = 200) -> None:
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", f"{ctype}; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802 - http.server API
        path = self.path.split("?", 1)[0]
        try:
            if path == "/":
                ov = payload.run_overview(self.work_dir)
                wf = payload.span_waterfall(self.work_dir)
                return self._send(render.render_overview(ov, wf), "text/html")
            if path == "/api/overview":
                return self._send(render.render_json(payload.run_overview(self.work_dir)),
                                  "application/json")
            if path == "/api/spans":
                return self._send(render.render_json(payload.span_waterfall(self.work_dir)),
                                  "application/json")
            m = _STEP_RE.match(path)
            if m:
                step = payload.step_payload(self.work_dir, int(m.group(2)))
                if m.group(1):
                    return self._send(render.render_json(step), "application/json")
                return self._send(render.render_step(step), "text/html")
            return self._send("not found", "text/plain", 404)
        except Exception as e:  # noqa: BLE001 - viewer must not kill training
            return self._send(f"viewer error: {e}", "text/plain", 500)


def make_server(work_dir: str, port: int = 0,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """port=0 binds an ephemeral port (tests); .server_address has the real one."""
    handler = type("BoundHandler", (TraceViewerHandler,), {"work_dir": work_dir})
    return ThreadingHTTPServer((host, port), handler)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("work_dir", help="run dir holding rollout_traces/ + rl_spans.jsonl")
    ap.add_argument("--port", type=int,
                    default=int(os.environ.get("XTUNER_TRACE_VIEWER_PORT", 18080)))
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()
    srv = make_server(args.work_dir, args.port, args.host)
    print(json.dumps({"viewer": f"http://{args.host}:{srv.server_address[1]}/",
                      "work_dir": args.work_dir}))
    srv.serve_forever()


if __name__ == "__main__":
    main()
