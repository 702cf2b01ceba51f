"""Profiling utilities — first-class tracing the reference lacks
(SURVEY.md §5: no tf.profiler anywhere upstream; only coarse wall-clock
prints, main.py:123-133).

  - `trace(logdir)`: jax.profiler trace context (view with TensorBoard /
    xprof), wired to the CLI `--profile` flag.
  - `StepTimer`: wall-clock step timing with explicit `block_until_ready`
    so device async dispatch doesn't fake the numbers; reports p50/p90 and
    steps/s, the step-time metric BASELINE.md tracks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times jitted steps correctly (blocks on the result pytree)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._seen = 0

    def time_step(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return out, dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": float(len(arr)),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_s": float(1.0 / arr.mean()),
        }


def flops_estimate(fn, *args) -> Optional[float]:
    """Ask XLA for the analyzed FLOP cost of a jitted function."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", -1.0))
    except Exception:
        return None


def cost_estimate(fn, *args) -> Optional[Dict[str, float]]:
    """XLA cost analysis of a jitted function: analyzed FLOPs and bytes
    accessed (HBM traffic), the two roofline axes. Returns None when the
    backend exposes no analysis."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {"flops": float(analysis.get("flops", -1.0)),
                "bytes_accessed": float(analysis.get("bytes accessed",
                                                     -1.0))}
    except Exception:
        return None
