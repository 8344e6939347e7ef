"""Profiling / tracing hooks (SURVEY.md §5: absent in the reference).

- :func:`trace`: context manager around ``jax.profiler`` capture
  (TensorBoard/Perfetto-viewable).
- :class:`StepProfiler`: per-step wall-clock with ``block_until_ready``
  semantics + rolling stats; step-ms is the benchmark contract.
- :func:`debug_shapes`: reproduces the reference's step-0 shape-trace UX
  (02_stable_diffusion-3 ``debug`` prints) for any pytree of arrays.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fdsd_trace"):
    """Capture a profiler trace: view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Honest per-step timing (blocks on device results)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        return False

    def stop(self, *arrays) -> float:
        for a in arrays:
            jax.block_until_ready(a)
        dt = (time.perf_counter() - self._t0) * 1e3
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        return statistics.fmean(self._times) if self._times else float("nan")

    @property
    def p50_ms(self) -> float:
        return statistics.median(self._times) if self._times else float("nan")

    def summary(self) -> dict:
        return {"steps": len(self._times), "mean_ms": round(self.mean_ms, 3),
                "p50_ms": round(self.p50_ms, 3)}


def debug_shapes(tag: str, tree, enabled: bool = True):
    """Print name→shape/dtype for a pytree (the reference's step-0 trace)."""
    if not enabled:
        return
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    print(f"=== {tag} ===")
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        print(f"  {name}: {getattr(leaf, 'shape', ())} "
              f"{getattr(leaf, 'dtype', type(leaf).__name__)}")


def nan_check(tree, label: str = ""):
    """Runtime NaN assert (reference idiom 06_.../utils.py:167), opt-in."""
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if bool(jnp.any(jnp.isnan(leaf))):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                raise FloatingPointError(f"NaN in {label}{name}")
