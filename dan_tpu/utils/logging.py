"""Structured metrics logging (SURVEY.md §5 'Metrics / logging'):
JSONL metrics file + stdout, replacing the reference's tf.summary/
TensorBoard scalars."""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self.path = None
        self._f = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
            self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], echo: bool = True):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if echo:
            kv = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k != "time"
            )
            print(f"[{rec['time']:9.1f}s] {kv}", file=sys.stderr)

    def close(self):
        if self._f:
            self._f.close()
