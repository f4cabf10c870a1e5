"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so sharding paths (SURVEY.md SS2.3)
are exercised without TPU hardware; benchmarks (bench.py) run on the real
chip. Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
