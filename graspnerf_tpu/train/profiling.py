"""Tracing / profiling utilities (SURVEY §5.1 — the reference has only ad-hoc
time.time() spans; here throughput counters and device traces are first-class).

- `ThroughputMeter`: rays/s, TSDF-queries/s, steps/s with EMA smoothing.
- `trace(dir)`: context manager around jax.profiler for TensorBoard-viewable
  device traces.
- `timed`: host-side span timer matching the reference's planning_time logging.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class ThroughputMeter:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rates: Dict[str, float] = {}
        self._t: Dict[str, float] = {}

    def start(self, name: str):
        self._t[name] = time.perf_counter()

    def stop(self, name: str, units: float) -> float:
        """Record `units` work items since start(name); returns smoothed
        units/s."""
        dt = time.perf_counter() - self._t.pop(name)
        rate = units / max(dt, 1e-9)
        prev = self.rates.get(name)
        self.rates[name] = rate if prev is None else (
            self.ema * prev + (1 - self.ema) * rate)
        return self.rates[name]

    def summary(self) -> Dict[str, float]:
        return dict(self.rates)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace for tensorboard --logdir=<log_dir> (plugin 'profile')."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(record: Dict[str, float], key: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record[key] = time.perf_counter() - t0


def rays_per_step(n_rays: int, coarse: int = 40, fine: int = 40,
                  hierarchical: bool = True) -> int:
    """Ray-evaluation count of one renderer pass (for rays/s accounting)."""
    return n_rays * ((coarse + fine) if hierarchical else coarse)
