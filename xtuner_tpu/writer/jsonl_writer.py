"""JSONL experiment tracker (reference: xtuner/v1/_writer/jsonl_writer.py —
the default exp tracker with an async background flush thread). The CI
metric-regression harness greps this file (SURVEY.md §4.7)."""

from __future__ import annotations

import json
import queue
import threading
from pathlib import Path
from typing import Any


class JsonlWriter:
    def __init__(self, log_dir: str | Path, filename: str = "tracker.jsonl"):
        self.path = Path(log_dir) / filename
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._queue: queue.Queue = queue.Queue()
        self._file = open(self.path, "a")
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._queue.get()
            if item is None:
                break
            self._file.write(json.dumps(item) + "\n")
            self._file.flush()

    def add_scalars(self, scalars: dict[str, Any], step: int) -> None:
        record = {"step": step}
        record.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in scalars.items()})
        self._queue.put(record)

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=5)
        self._file.close()
