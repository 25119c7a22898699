"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

This environment may register a TPU PJRT plugin eagerly at interpreter start
(via sitecustomize) and pin JAX_PLATFORMS to it; initializing that plugin
deadlocks with torch-cpu (the golden oracle in op-parity tests).  We therefore
steer jax to the CPU backend *before any backend is initialized*: env vars are
not enough (sitecustomize wins), but ``jax.config.update`` is honored as long
as no device has been touched yet — conftest runs before any test imports.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_ENABLE_X64", "0")

# Must precede CPU backend initialization for the 8-device virtual mesh.
from unipose_tpu.utils.platform import force_cpu_platform  # noqa: E402

force_cpu_platform(8)

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (minutes on CPU mesh)"
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
