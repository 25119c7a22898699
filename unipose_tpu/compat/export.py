"""Serialized inference artifacts via ``jax.export`` (StableHLO).

No reference equivalent (the reference serves nothing; SURVEY §1 "no serving
layer") — this is the TPU-native deployment story: a self-contained,
version-stable artifact of the jitted forward (weights baked in) that any
JAX runtime can load and run without the Python model definition.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def export_inference(
    model,
    variables,
    input_shape: Tuple[int, ...],
    *,
    path: Optional[str] = None,
    video: bool = False,
    forward=None,
) -> bytes:
    """Export the eval-mode forward as serialized StableHLO bytes.

    input_shape: (B, H, W, 3) image or (B, T, H, W, 3) video.
    ``forward`` overrides the default ``model.apply`` closure (image: f(x);
    video: f(frames, centermap)) — used for the int8-front-end serving
    variant (models/quantized.py).
    Returns the serialized bytes (also written to ``path`` when given).
    """
    from jax import export as jax_export

    if video:
        b, t, h, w, c = input_shape

        if forward is not None:
            fwd = forward
        else:

            def fwd(frames, centermap):
                return model.apply(variables, frames, centermap, train=False)

        args = (
            jax.ShapeDtypeStruct(input_shape, jnp.float32),
            jax.ShapeDtypeStruct((b, t, h, w, 1), jnp.float32),
        )
    else:
        if forward is not None:
            fwd = forward
        else:

            def fwd(x):
                return model.apply(variables, x, train=False)

        args = (jax.ShapeDtypeStruct(input_shape, jnp.float32),)

    exported = jax_export.export(jax.jit(fwd))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns the ``Exported`` object
    (``.call`` to invoke; ``.in_avals``/``.out_avals`` carry the exact input
    geometry and output channel count — consumers should derive shapes from
    these rather than trusting side-channel flags)."""
    from jax import export as jax_export

    return jax_export.deserialize(blob)


def load_inference(blob: bytes):
    """Deserialize an exported artifact; returns a callable."""
    return load_exported(blob).call
