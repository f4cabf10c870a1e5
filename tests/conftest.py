"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so sharding paths (SURVEY.md
SS2.3) are exercised without TPU hardware; benchmarks (bench.py) and the
TPU-only Pallas tests run on the real chip.

NB: this environment injects a sitecustomize that registers the remote
'axon' TPU backend and forcibly sets jax_platforms='axon,cpu' in every
interpreter -- env vars (JAX_PLATFORMS / XLA_FLAGS) are overridden before
any user code runs. The only effective override is jax.config.update
AFTER importing jax, BEFORE first backend use.
"""

import os

import jax

if not os.environ.get("QBOLD_TEST_TPU"):
    # Default: virtual 8-device CPU mesh. Set QBOLD_TEST_TPU=1 to keep
    # the real TPU backend (runs the Pallas kernel tests, skips none).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
