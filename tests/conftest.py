"""Test configuration: run everything on 8 virtual CPU devices.

This environment's sitecustomize registers the axon TPU PJRT plugin before
conftest runs, so JAX_PLATFORMS in the environment is not enough — we force
the platform through jax.config after import. Set LCBI_TEST_TPU=1 to run the
suite on the real chip instead (single device; mesh paths collapse to 1).

8 fake CPU devices exercise the same Mesh/pjit code paths as a v5e-8
(SURVEY.md §4).

Iteration speed: the ~19 tests over ~30s each (interpret-mode kernel parity
at model scale, full-loop e2e) carry @pytest.mark.slow — `pytest -m "not
slow"` runs the remaining suite in ~6 min on one CPU; CI / pre-commit runs
the full suite (~25-35 min).
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

# Persistent compile cache: ONLY on the real TPU. On the 8-device CPU mesh,
# XLA:CPU executables containing collective thunks abort inside
# AllGatherThunk::Execute when RELOADED from the persistent cache (reproduced
# deterministically: first run/cache-write passes, any cache-hit run crashes
# the process) — so multi-device CPU tests must always compile fresh.
if os.environ.get("LCBI_TEST_TPU"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """The active mesh is process-global (parallel/mesh.py); a test that sets
    a >1 'model' axis and fails (or forgets to reset) must not reroute every
    later test onto the sequence-parallel paths."""
    yield
    from long_context_biomedical_imaging_tpu.parallel import set_active_mesh
    set_active_mesh(None)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >30s interpret-mode/e2e test; skip with -m 'not slow'")
