"""Profiling and tracing utilities.

The reference has no profiling beyond wall-clock elapsed
(``base_learner.py:49-52``); the TPU-native replacement wires
``jax.profiler`` traces (viewable in TensorBoard/XProf/Perfetto) plus a
lightweight step timer.

The config-driven path (``TPU.PROFILE_DIR <dir>`` traces the first
``TPU.PROFILE_STEPS`` train steps of epoch 0) lives inline in
``engine/trainer.py::run_epoch`` — it must drain the async dispatch
queue before closing the trace. The helpers here are for ad-hoc /
notebook profiling of arbitrary code blocks.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager around jax.profiler.trace."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Aggregates per-step wall times; report() returns summary stats."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def report(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "max_s": ts[-1],
        }
