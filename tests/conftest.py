"""Test configuration: force an 8-device virtual CPU mesh.

The test suite never requires TPU hardware (mirroring the reference's
mockable-backend strategy, SURVEY.md section 4.5): all kernels run on the
CPU backend, and sharding tests use 8 virtual CPU devices. The real-chip
path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

# Must be set before the CPU backend is first initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-selects the TPU platform; tests
# override it back to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Drop the axon backend factory entirely: with the TPU tunnel down,
# initializing it blocks forever inside make_c_api_client (the register
# hook walks backends(), which would init every registered platform),
# hanging the whole suite. The suite is CPU-only by design.
try:
    from jax._src import xla_bridge as _xb  # noqa: E402

    _xb._backend_factories.pop("axon", None)
except Exception:  # private API: a jax upgrade must not kill collection
    pass

# NO persistent compilation cache for the suite: XLA:CPU executable
# (de)serialization segfaulted the run three times in round 3 -- once
# loading an entry (get_executable_and_time), twice around writing the
# largest programs (put_executable_and_time / backend_compile_and_load
# under _compile_and_write_cache). Recompiling per run is slower but
# deterministic; the TPU bench keeps its own cache (different backend,
# remote compile path).

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-parameter / high-volume tiers (run with RUN_SLOW=1; "
        "the default tier stays fast for iteration, reference pattern: "
        "concrete-ml is_weekly_option gate, conftest.py:204-219)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _seed_everything():
    np.random.seed(0)
    yield


@pytest.fixture
def rng():
    from tfhe_tpu.rng import FheRng

    return FheRng(42)
