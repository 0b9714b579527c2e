"""Test configuration: force a host-simulated 8-device CPU mesh.

Tests must be runnable without TPU hardware, and the parallelism tests need
multiple devices; JAX's virtual CPU devices provide both
(SURVEY.md §4: "distributed tests on host-simulated devices").
These env vars must be set before jax initializes its backends.
"""

import os

# Force CPU: the session environment may point JAX_PLATFORMS at a remote TPU
# tunnel (axon), which would route every tiny test op over the network AND run
# matmuls at bf16 default precision, breaking golden tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep numerics reproducible on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: XLA-CPU compiles cost seconds each; cache them
# across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import numpy as np
import pytest

# A sitecustomize (e.g. the axon TPU-tunnel bootstrap) may have imported jax
# at interpreter startup, before this conftest ran — in that case the env var
# above is too late, but the config knob still works until a backend is used.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
