"""Test configuration: run everything on 8 virtual CPU devices.

This environment's sitecustomize registers the axon TPU PJRT plugin before
conftest runs, so JAX_PLATFORMS in the environment is not enough — we force
the platform through jax.config after import. Set LCBI_TEST_TPU=1 to run the
suite on the real chip instead (single device; mesh paths collapse to 1).

8 fake CPU devices exercise the same Mesh/pjit code paths as a v5e-8
(SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("LCBI_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: model-wiring tests compile 12-layer graphs; cold
# compiles dominate test wall-clock otherwise. Keyed by the host's CPU flags:
# XLA:CPU AOT results compiled on a machine with different vector extensions
# SIGILL/abort when loaded (the cache key does not include machine features).
import hashlib  # noqa: E402


def _machine_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache_{_machine_key()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
