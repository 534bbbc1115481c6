"""Tracing and per-stage timing — the observability the reference lacks
(SURVEY.md §5: "Tracing/profiling: none; printf-based progress").

Two layers:
- ``trace(dir)``: a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace of everything inside it;
- ``StageTimer``: wall-clock stage accounting with explicit device sync,
  so stage times mean what they say under async dispatch (the axon
  backend even no-ops ``block_until_ready`` — we sync via a scalar
  transfer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force completion of the computation producing ``x`` (pytree)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return
    # A scalar device→host transfer is the only reliable barrier on
    # backends whose block_until_ready is asynchronous.
    for leaf in leaves[:1]:
        jnp.asarray(leaf).ravel()[0].item()


class StageTimer:
    """Accumulates (stage → seconds) with device-synchronized edges.

    Usage::

        timer = StageTimer()
        with timer.stage("correlate"):
            out = correlate(...)
            timer.observe(out)   # sync point inside the stage
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.times:
                self.order.append(name)
                self.times[name] = 0.0
            self.times[name] += dt

    def observe(self, x) -> None:
        sync(x)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"total {total*1e3:8.1f} ms"]
        for name in self.order:
            t = self.times[name]
            lines.append(
                f"  {name:<20s} {t*1e3:8.1f} ms  ({100*t/max(total,1e-12):4.1f}%)"
            )
        return "\n".join(lines)
