"""Tracing / profiling / observability helpers.

The reference has no tracing or profiling at all (SURVEY.md SS5.1); this
is the TPU framework's first-class replacement: jax.profiler traces for
XLA-level analysis, a lightweight step timer with tunnel-safe
synchronisation, and a NaN/Inf guard usable as a metric post-hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "sync", "check_finite",
           "steady_state_step_time"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> None:
    """Synchronise on device work by fetching one element to host.

    ``jax.block_until_ready`` is not reliable through tunneled TPU
    backends (see bench.py); a device->host value fetch is. Fetches a
    single leading element of the first array leaf.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "shape")]
    if leaves:
        x = leaves[0]
        jax.device_get(x[(0,) * x.ndim] if x.ndim else x)


def steady_state_step_time(step_fn, state, key, batch,
                           reps: int = 50, blocks: int = 3) -> float:
    """Median-of-blocks steady-state time of a chained train step.

    THE canonical tunnel-safe step-timing discipline (single owner --
    bench.py and benchmarks/diag_elbo_ab.py import it): warm twice
    (compile + steady), then ``blocks`` runs of ``reps`` state-chained
    steps each with ONE device-fetch sync per block. Every timed block
    pays one ~35-40 ms tunnel round-trip between its closing fetch and
    the next block's first dispatch landing, so >=50 reps amortise the
    latency to <1% (small-rep blocks OVERSTATE per-step time by
    latency/reps; CLAUDE.md). ``step_fn(state, key, batch) ->
    (state, aux)``; returns seconds/step."""
    state, _ = step_fn(state, key, batch)     # compile
    state, _ = step_fn(state, key, batch)
    sync(state.params if hasattr(state, "params") else state)
    out = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, _ = step_fn(state, key, batch)
        sync(state.params if hasattr(state, "params") else state)
        out.append((time.perf_counter() - t0) / reps)
    return float(np.median(out))


class StepTimer:
    """Rolling per-step wall-clock statistics."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: Optional[float] = None
        self._step = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self._step += 1
        if self._step > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "step_time_mean_s": float(t.mean()),
            "step_time_p50_s": float(np.percentile(t, 50)),
            "step_time_p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
        }


def check_finite(metrics: dict, where: str = "") -> dict:
    """Raise on NaN/Inf metrics (the framework-level TerminateOnNaN,
    reference: train.py:375,423)."""
    bad = {k: v for k, v in metrics.items()
           if not np.all(np.isfinite(np.asarray(v)))}
    if bad:
        raise FloatingPointError(f"non-finite metrics {where}: {bad}")
    return metrics
