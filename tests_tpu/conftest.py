"""On-hardware tests: run on whatever accelerator backend is live.

Unlike tests/ (which pins a virtual CPU mesh), this directory intentionally
does NOT touch jax platform config: its tests exist to catch Mosaic lowering
errors, scoped-VMEM overflows, and dtype-legality bugs that interpret-mode
tests are structurally blind to (the round-3 failure class — VERDICT.md r3,
What's weak #1/#3). They skip themselves when no accelerator is present.

Run: python -m pytest tests_tpu/ -x -q   (bench.py also probes the same
kernel-compile+parity path before enabling the kernel).
"""
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
