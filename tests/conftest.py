"""Test configuration: CPU backend, 8 virtual devices, float64.

Oracle tests follow the reference's pattern — sketched machinery must equal
hand-composed dense expressions to tight tolerance (reference
preconditioners/tests.py) — which requires f64, hence the CPU backend.
Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

# must run before jax initializes. RLA4MOR_TPU_TESTS=1 leaves the live
# (TPU) backend alone for the TPU-only kernel tests (test_gaussian_pallas).
if os.environ.get("RLA4MOR_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"

    import jax

    # jax may already be imported by a pytest plugin with env-derived
    # defaults; force the settings through the config API as well.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def thermal_fom():
    from rla4mor_tpu.models import ThermalBlockFOM

    return ThermalBlockFOM(grid_shape=(2, 2), num_intervals=16)


@pytest.fixture(scope="session")
def thermal_fom_3x3():
    from rla4mor_tpu.models import ThermalBlockFOM

    return ThermalBlockFOM(grid_shape=(3, 3), num_intervals=18)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
