"""Unit tests for unipose_tpu.parallel.mesh helpers.

The multi-host init path can't run end-to-end here (one host), but its
critical contract is testable: multi-host presence must be decided from the
launcher env WITHOUT touching the backend first — calling
``jax.process_count()`` before ``jax.distributed.initialize()`` would
initialize the local backend and defeat real multi-host bring-up
(the reference has no distributed code at all; SURVEY §2.2).
"""

import jax
import numpy as np
import pytest

from unipose_tpu.parallel import mesh as mesh_mod
from unipose_tpu.parallel.mesh import make_mesh, maybe_init_distributed


@pytest.fixture(autouse=True)
def _reset_init_flag(monkeypatch):
    monkeypatch.setattr(mesh_mod, "_distributed_initialized", False)


def _instrument(monkeypatch, calls):
    """Record every backend touch and every distributed.initialize call."""

    def fake_initialize(*a, **k):
        calls.append("initialize")

    def fake_process_count():
        calls.append("process_count")
        return 1

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_count", fake_process_count)


def test_single_host_is_total_noop(monkeypatch):
    for var in mesh_mod._COORDINATOR_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    calls = []
    _instrument(monkeypatch, calls)
    maybe_init_distributed()
    assert calls == []  # no backend touch of any kind


def test_multi_host_initializes_before_any_backend_touch(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    calls = []
    _instrument(monkeypatch, calls)
    maybe_init_distributed()
    assert calls[0] == "initialize"  # nothing touched the backend earlier
    # idempotent: a second call must not re-initialize
    maybe_init_distributed()
    assert calls.count("initialize") == 1


def test_bare_env_launch_forwards_counts(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    seen = {}

    def fake_initialize(*a, **k):
        seen.update(k)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    maybe_init_distributed()
    assert seen == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_megascale_env_also_triggers_and_forwards_address(monkeypatch):
    # jax's initialize() only reads JAX_COORDINATOR_ADDRESS from env; an
    # address detected under another accepted name must be passed explicitly
    # or the very var that fired the branch couldn't satisfy it.
    for var in mesh_mod._COORDINATOR_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    seen = {}

    def fake_initialize(*a, **k):
        seen.update(k)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    maybe_init_distributed()
    assert seen["coordinator_address"] == "10.0.0.1:8476"


def test_make_mesh_infers_negative_one():
    m = make_mesh((-1,), ("data",))
    assert m.devices.shape == (len(jax.devices()),)
    m2 = make_mesh((2, -1), ("data", "model"), devices=jax.devices()[:8])
    assert m2.devices.shape == (2, 4)
    assert m2.axis_names == ("data", "model")


def test_shard_batch_passes_nonarrays_through(eight_devices):
    m = make_mesh((8,), ("data",))
    batch = {
        "x": np.zeros((8, 4), np.float32),
        "paths": ["a"] * 8,
    }
    out = mesh_mod.shard_batch(batch, m)
    assert out["paths"] == ["a"] * 8
    assert out["x"].sharding.spec[0] == "data"
