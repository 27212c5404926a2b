"""Test configuration: force CPU with 8 virtual devices.

Tests run on the host platform so they are deterministic, fast to compile,
and can exercise multi-chip sharding (8 virtual devices) without TPU
hardware.  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's axon TPU plugin force-prepends itself to jax_platforms
# regardless of JAX_PLATFORMS; override the config post-import so tests run
# on the host CPU (deterministic, fast compiles, 8 virtual devices).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available for oracle tests
# never reuse persistent compile artifacts in tests (machine-feature drift)
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
