"""Test environment: force CPU with 8 virtual devices so the whole suite —
including multi-chip sharding tests — runs without TPU hardware
(SURVEY.md §4: interpret-mode/CPU testing strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); the config update
# below actually wins over the env var, forcing the suite onto the CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
