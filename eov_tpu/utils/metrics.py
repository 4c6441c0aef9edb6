"""Structured run metrics — jsonl sink + wall-clock timers.

SURVEY.md §5 metrics/observability: the reference prints episode accuracy
lines; production runs here additionally append one JSON object per event to
``metrics.jsonl`` (resolved config, per-phase step times, clips/sec/chip,
final accuracy ± CI) so runs are machine-comparable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, IO

__all__ = ["MetricsWriter", "Timer"]


class MetricsWriter:
    """Append-only jsonl event sink; no-op when path is None."""

    def __init__(self, path: str | None):
        self._f: IO[str] | None = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")

    def write(self, event: str, **fields: Any) -> None:
        if self._f is None:
            return
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


class Timer:
    """Wall-clock phase timer; use with jax block_until_ready fences."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt
