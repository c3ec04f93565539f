"""Tracing / profiling subsystem.

The reference has none (SURVEY.md section 5: wall-clock prints only).  Here:
`StageTimer` accumulates named per-stage wall times with context-manager
scopes (blocking on device results so timings are real), and `trace` wraps
``jax.profiler`` to dump a TensorBoard/Perfetto trace directory for kernel-
level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating named timers: ``with timer("icp"): ...``; report() -> dict."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result is not None:
                jax.block_until_ready(result)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def measure(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in sorted(self.totals)
        }

    def summary(self) -> str:
        return "\n".join(
            f"{k:24s} {v['count']:6d} calls  {v['mean_ms']:9.3f} ms/call  {v['total_s']:8.3f} s"
            for k, v in self.report().items()
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace scope -> TensorBoard/Perfetto dump in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
