"""Tracing / profiling helpers.

The reference's only observability is wall-clock timing stored in
outputs.json (SURVEY §5). Here: a ``jax.profiler`` trace context for device
timelines, a per-step timer with warmup-aware statistics, and a utility to
time jitted callables with the tunnel-safe synchronization this image needs
(``block_until_ready`` does not synchronize on the axon platform; a scalar
fetch does — see ``.claude/skills/verify/SKILL.md``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force execution and return a scalar from the result pytree —
    the reliable device barrier on this image's tunneled TPU."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


# dense bf16 peak TFLOP/s by device kind (public spec sheets)
PEAK_TFLOPS = [
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 197.0),
    ("v6", 918.0), ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
]


def peak_tflops(device_kind: str) -> Optional[float]:
    """Dense-bf16 peak for an MFU denominator, or None if unknown."""
    kind = device_kind.lower()
    for key, val in PEAK_TFLOPS:
        if key in kind:
            return val
    return None


def compiled_flops(jitted, *args, **kwargs) -> Optional[float]:
    """XLA cost-analysis FLOPs of ``jitted(*args, **kwargs)``, or None if
    the backend provides no cost model. One place for the list-vs-dict
    return quirk so every benchmark counts FLOPs the same way."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


class StepTimer:
    """Per-step wall-time statistics with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": float("nan"), "p50_s": float("nan"),
                    "p95_s": float("nan"), "steps": 0}
        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps": len(t),
        }


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 2) -> Dict[str, float]:
    """Time a jitted callable with fetch-based synchronization."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": 1.0 / dt}
