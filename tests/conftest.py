"""Test harness: force an 8-device virtual CPU mesh before any test runs.

The session environment pins JAX_PLATFORMS=axon (real TPU) and the axon
plugin ignores env-var overrides, so we switch platforms via jax.config.
Multi-chip sharding paths are exercised on CPU via
--xla_force_host_platform_device_count (SURVEY.md §4); real-TPU benchmarking
happens only in bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
