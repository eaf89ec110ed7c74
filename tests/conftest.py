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

# Persistent compilation cache: CPU compiles of the big train/eval steps take
# 1-3 min each and dominate suite time; cached reruns load in seconds.
# Opt out with NL_VSGG_NO_JAX_CACHE=1 (e.g. when bisecting compiler issues).
if not os.environ.get("NL_VSGG_NO_JAX_CACHE"):
    _cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/nl_vsgg_jax"))
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
