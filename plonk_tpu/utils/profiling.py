"""Tracing / profiling / metrics (SURVEY §5 — absent in the reference,
whose only debug aid is poly_print, src/plonk.h:197-220).

- `round_scope`: `jax.named_scope` wrappers so prover rounds show up as
  named regions in XProf/Perfetto traces (`jax.profiler.trace`).
- `Timer` + `throughput`: wall-clock helpers with block_until_ready.
- `trace_to`: context manager dumping a profiler trace directory.
- `metrics_line`: the canonical one-line JSON metric record used by
  bench.py and the scaling reports.
"""
from __future__ import annotations

import contextlib
import json
import time

import jax


def round_scope(name: str):
    """Named scope for a prover round (visible in profiler traces)."""
    return jax.named_scope(f"plonk/{name}")


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture an XProf/Perfetto trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing with device synchronization."""

    def __init__(self):
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def timeit(fn, *args, reps: int = 3, warmup: int = 1):
    """Median-free simple average over `reps` after `warmup` runs; blocks
    on the result each time. Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def throughput(items: int, seconds: float) -> float:
    return items / seconds if seconds > 0 else float("inf")


def metrics_line(metric: str, value: float, unit: str,
                 vs_baseline: float | None = None, **extras) -> str:
    rec = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = vs_baseline
    rec.update(extras)
    return json.dumps(rec)
