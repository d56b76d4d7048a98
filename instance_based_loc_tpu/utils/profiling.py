"""Observability: per-stage frame timing, JSONL metrics logging, and
jax.profiler trace capture (SURVEY.md §5 — the reference has only RSS/VRAM
prints; fps/chip is this build's north star so stage timing is first-class).
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named stage across frames. Thread-safe
    (the overlapped serving path times dispatch and fetch on two threads).

    with timer.stage("registration"):
        ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    # locks don't pickle/deepcopy; timers ride inside ObjectMemory pickles
    def __getstate__(self):
        return {"totals": dict(self.totals), "counts": dict(self.counts)}

    def __setstate__(self, state):
        self.totals = defaultdict(float, state["totals"])
        self.counts = defaultdict(int, state["counts"])
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            avg = self.totals[name] / max(self.counts[name], 1)
            lines.append(f"{name}: total {self.totals[name]:.3f}s, "
                         f"n={self.counts[name]}, avg {avg * 1000:.1f}ms")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {name: {"total_s": self.totals[name], "count": self.counts[name]}
                for name in self.totals}


class MetricsLogger:
    """Append-only JSONL metrics (the reference logged to wandb with a
    hard-coded API key — processor_depth.py:34-36; we log locally)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def log(self, step: int, **metrics):
        record = {"step": step, "time": time.time(), **
                  {k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
