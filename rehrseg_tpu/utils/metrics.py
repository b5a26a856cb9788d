"""Structured metrics logging (observability the reference lacked —
SURVEY.md §5 lists only stdout prints + tqdm).

Writes one JSON object per line to ``<dir>/metrics.jsonl`` with a wall-clock
timestamp, plus keeps the running history in memory for quick inspection.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, directory: str, filename: str = "metrics.jsonl"):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, filename)
        self.history: list[dict] = []

    def log(self, step: int, **metrics):
        # multi-host: every process trains in lockstep with identical
        # metrics — one writer keeps the shared-storage jsonl uncorrupted
        from ..parallel.multihost import is_primary
        if not is_primary():
            return None
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self.history.append(rec)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def last(self, key: str):
        for rec in reversed(self.history):
            if key in rec:
                return rec[key]
        return None
