"""Profiling / tracing hooks (SURVEY §5: the reference has only wall-clock
logging; here we expose jax.profiler traces + stage timers).

Usage:
    with trace("out/trace"):            # XLA/TPU trace for TensorBoard
        step(...)

    t = StageTimer()
    with t.stage("backbone"):
        ...
    print(t.summary())
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Host-side stage timing with device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.device_get(jax.tree_util.tree_leaves(sync)[0].ravel()[:1])
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        rows = [f"{k}: {self.totals[k] * 1000 / max(self.counts[k], 1):.1f} "
                f"ms avg over {self.counts[k]}" for k in sorted(self.totals)]
        return "\n".join(rows)

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump({k: {"total_s": self.totals[k],
                           "count": self.counts[k]}
                       for k in self.totals}, f, indent=1)
