"""Test configuration: force an 8-device virtual CPU platform.

The session environment pre-imports jax with a TPU ('axon') platform pinned, so
env vars alone are too late — we update jax's config directly before any backend
is initialized. Sharding semantics (pjit / shard_map over the (data, space)
mesh) are validated on virtual CPU devices; real-TPU runs happen via bench.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# fp32 matmuls on CPU for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
