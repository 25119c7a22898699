"""Device mesh construction and GSPMD sharding helpers.

The reference is single-GPU with no distributed code (SURVEY §2.2); the
TPU-native scaling story is single-program GSPMD: a 1-D ``data`` mesh over
ICI, batches sharded on it, parameters replicated, gradients and BatchNorm
statistics all-reduced by XLA-inserted collectives.  Multi-host extends the
same program via ``jax.distributed.initialize`` (call ``maybe_init_distributed``
before building the mesh on multi-host slices).
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Launcher-set variables that signal a multi-host run.  Presence is decided
# from env ONLY: touching jax.process_count() (or any other backend query)
# first would initialize the local backend and defeat
# jax.distributed.initialize(), which must run before any backend use.
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)
# Cluster launchers jax.distributed auto-detects (jax._src.clusters); a
# world size > 1 in any of these also signals multi-host.
_WORLD_SIZE_ENV_VARS = ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE")

_distributed_initialized = False


def _multi_host_launch() -> bool:
    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    for v in _WORLD_SIZE_ENV_VARS:
        try:
            if int(os.environ.get(v, "1")) > 1:
                return True
        except ValueError:
            pass
    # multi-host Cloud TPU pod: libtpu env lists all worker hostnames
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len(hostnames.split(",")) > 1


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched across hosts (no-op on a
    single process).  DCN coordinates multi-slice; ICI carries the
    collectives inside a slice.  Safe to call more than once.

    jax's cluster auto-detect covers SLURM/OpenMPI/k8s/Cloud-TPU; for bare
    env launches (coordinator address only) the process count and id are
    read from JAX_NUM_PROCESSES / JAX_PROCESS_ID since this jax version's
    ``initialize()`` does not.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    if not _multi_host_launch():
        return
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    # initialize() only reads JAX_COORDINATOR_ADDRESS from the environment;
    # forward an address detected under the other accepted names so the var
    # that triggered this branch can actually satisfy it.
    coordinator = next(
        (os.environ[v] for v in _COORDINATOR_ENV_VARS if os.environ.get(v)), None
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    _distributed_initialized = True
    assert jax.process_count() >= 1


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; a single -1 dimension absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        if known > len(devices):
            raise ValueError(
                f"mesh shape {tuple(shape)} needs at least {known} devices "
                f"but only {len(devices)} are available"
            )
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices but only "
            f"{len(devices)} are available"
        )
    # A mesh smaller than the device pool strands the rest (e.g. 8 chips
    # with (-1, 3) -> a 2x3 mesh leaves 2 idle; (3,) leaves 5).  Non-divisor
    # shapes are almost certainly a divisibility mistake -> error.  An exact
    # smaller mesh (e.g. (1,) on an 8-device host for single-chip runs) is a
    # legitimate deliberate choice -> allowed, but visibly (ADVICE r4:
    # silent divisor sub-meshes partially defeat the guard).
    if n < len(devices):
        stranded = len(devices) - n
        if len(devices) % n != 0:
            raise ValueError(
                f"mesh shape {tuple(shape)} uses {n} of {len(devices)} "
                f"devices, stranding {stranded}; pick a shape whose product "
                "divides the device count (or pass `devices` explicitly)"
            )
        warnings.warn(
            f"mesh shape {tuple(shape)} uses {n} of {len(devices)} devices "
            f"({stranded} idle); pass `devices` explicitly to silence",
            stacklevel=2,
        )
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading dim is the global batch."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.  Multi-host:
    every process must hold the same host values (deterministic same-seed
    init or a restored checkpoint — both true in the Trainer); each process
    then contributes its identical copy (put_sharded P() semantics: local
    data == global data)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: put_sharded(x, sharding)
        if isinstance(x, (np.ndarray, jax.Array))
        or np.isscalar(x)
        or hasattr(x, "shape")
        else x,
        tree,
    )


def put_sharded(x, sharding: NamedSharding):
    """Host array -> device array under ``sharding``, multi-host aware.

    Single process: plain ``device_put``.  Multi-host (jax.distributed
    initialized across OS processes): each process's loader yields only its
    LOCAL portion of the global batch, so the local array is stitched into
    a global jax.Array via ``make_array_from_process_local_data`` — the
    global shape is the per-process shape scaled along the sharded dims.
    (A bare device_put would treat every process's local array as the full
    global value — silently training on process-0-shaped data.)"""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch onto the mesh, sharded along the leading dim.
    Non-array leaves (paths etc.) pass through untouched.  Multi-host:
    ``batch`` is this process's local shard (put_sharded)."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            return put_sharded(x, sharding)
        return x

    return jax.tree_util.tree_map(
        put, batch, is_leaf=lambda x: not isinstance(x, dict)
    )
