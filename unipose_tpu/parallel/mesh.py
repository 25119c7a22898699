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
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched across hosts (no-op on a
    single process).  DCN coordinates multi-slice; ICI carries the
    collectives inside a slice."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


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
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading dim is the global batch."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch onto the mesh, sharded along the leading dim.
    Non-array leaves (paths etc.) pass through untouched."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(
        put, batch, is_leaf=lambda x: not isinstance(x, dict)
    )
