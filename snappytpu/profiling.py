"""Tracing/profiling utilities (SURVEY.md §5.1).

The reference times whole codec calls with clock() (result.c:10-17).  Here:
per-stage wall timings with device sync, a phase breakdown report, and an
optional jax.profiler trace wrapper for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage, syncing the device at each
    boundary so stage costs are attributable (dispatch is async)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync_arrays:
            jax.block_until_ready(sync_arrays)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        if not self.totals:
            return "(no stages recorded)"
        width = max(len(k) for k in self.totals)
        total = sum(self.totals.values())
        lines = [f"{'stage':<{width}}  calls     ms    share"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:<{width}}  {self.counts[name]:>5}  {t*1000:>7.2f}  {t/total*100:>5.1f}%"
            )
        lines.append(f"{'TOTAL':<{width}}  {'':>5}  {total*1000:>7.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 5, warmup: int = 1):
    """Compile-then-measure helper: returns (result, seconds_per_call)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps
