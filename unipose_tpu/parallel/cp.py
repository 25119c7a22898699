"""Sequence/context parallelism for the video model (SURVEY §5.7 growth path).

The reference rolls the whole tower serially once per frame on one GPU
(Reference: uniposeLSTM.py:124-128).  Data parallelism (parallel/mesh.py)
scales the *batch of clips*; this module scales a *single clip's rollout*
across chips: frames shard over a ``time`` mesh axis for the
carry-independent tower + 11x11 head (≈99% of the FLOPs, batched over B*T
in models/unipose_lstm.py), and only the tiny ConvLSTM scan runs replicated
on all-gathered per-frame features — the smallest tensor in the program
(h/8 * w/8 * (K+2), ~63 KB/frame at 368² bf16).

Composition with data parallelism is a 2-D ``(data, time)`` mesh: clips
shard over ``data``, frames of each clip over ``time``; XLA partitions the
(B*T)-batched tower over both axes at once.  All collectives ride ICI.

Usage::

    mesh = make_video_mesh(n_data=2, n_time=4)
    config = dataclasses.replace(config, spmd_axes=("data", "time"))
    model = build_model(config)
    step = make_train_step(model, tx, spec, video=True)
    with jax.set_mesh(mesh):                 # mesh context for tracing the
        state, metrics = step(state, batch)  # model's sharding constraints

``jax.set_mesh`` is only needed while a step *traces* (first call per
shape); wrap calls in it unconditionally — it is free after compilation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unipose_tpu.parallel.mesh import make_mesh


def make_video_mesh(
    n_data: int = 1,
    n_time: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``(data, time)`` mesh; ``-1`` absorbs the remaining devices.

    Keep ``time`` the minor (fastest-varying) axis so the per-clip feature
    all-gather before the scan rides neighbouring ICI links.
    """
    return make_mesh((n_data, n_time), ("data", "time"), devices=devices)


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, T, ...) clip tensors: B over data, T over time."""
    return NamedSharding(mesh, P("data", "time"))


# Leaf names that are (B, T, ...) per-FRAME clip tensors — dim 1 is time and
# shards over the 'time' axis.  Anything else is per-CLIP and shards over
# 'data' only (ADVICE r4: a rank-based heuristic would wrongly send a
# (B, K, 3) per-clip leaf's K dim over 'time').
CLIP_LEAVES = frozenset({"frames", "kpts", "centers"})


def shard_clip_batch(batch, mesh: Mesh):
    """Put a host video batch onto a (data, time) mesh: the known per-frame
    leaves (``CLIP_LEAVES`` — (B, T, ...) tensors) shard (B, T) over
    (data, time); every other array leaf is per-clip and shards its leading
    dim over ``data`` only.  Non-array leaves pass through."""
    from unipose_tpu.parallel.mesh import put_sharded

    sharding = clip_sharding(mesh)
    data_only = NamedSharding(mesh, P("data"))

    def put(path, x):
        if isinstance(x, (np.ndarray, jax.Array)):
            name = path[-1].key if path and hasattr(path[-1], "key") else None
            if name in CLIP_LEAVES and x.ndim >= 2:
                return put_sharded(x, sharding)
            if x.ndim >= 1:
                return put_sharded(x, data_only)
        return x

    return jax.tree_util.tree_map_with_path(
        put, batch, is_leaf=lambda x: not isinstance(x, dict)
    )


def under_mesh(mesh: Mesh, fn):
    """Wrap ``fn`` so every call runs inside ``jax.set_mesh(mesh)`` — the
    context the model's ``with_sharding_constraint(P(...))`` calls need at
    trace time."""

    def wrapped(*args, **kwargs):
        with jax.set_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped
