"""Test configuration: run everything on 8 virtual CPU devices.

Must run before any `import jax` so the XLA flags take effect. This exercises
the same Mesh/pjit code paths as a real v5e-8 (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache: model-wiring tests compile 12-layer graphs; cold
# CPU compiles dominate test wall-clock otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
