"""Structured training/inference metrics.

The reference's observability is bare ``print()`` (SURVEY.md §5). Here every
metric event is one JSON line (machine-parseable, greppable) mirrored as a
human-readable console line; per-step wall-clock and throughput are
first-class since step-ms is the benchmark contract (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None, stream: IO = sys.stderr,
                 prefix: str = ""):
        self._file = open(jsonl_path, "a") if jsonl_path else None
        self._stream = stream
        self._prefix = prefix
        self._t0 = time.monotonic()

    def log(self, event: str, **metrics):
        rec = {"event": event, "t": round(time.monotonic() - self._t0, 3),
               **metrics}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        body = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items())
        print(f"{self._prefix}[{event}] {body}", file=self._stream)

    def close(self):
        if self._file:
            self._file.close()


class StepTimer:
    """Wall-clock timer that blocks on device results for honest step-ms."""

    def __init__(self):
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, *arrays) -> float:
        import jax

        for a in arrays:
            jax.block_until_ready(a)
        return (time.perf_counter() - self._start) * 1e3
