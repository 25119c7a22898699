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
    raw_uint8: bool = False,
) -> bytes:
    """Export the eval-mode forward as serialized StableHLO bytes.

    input_shape: (B, H, W, 3) image or (B, T, H, W, 3) video.
    ``forward`` overrides the default ``model.apply`` closure (image: f(x);
    video: f(frames, centermap)) — used for the int8-front-end serving
    variant (models/quantized.py).
    ``raw_uint8``: bake the (x-128)/256 normalization INTO the artifact and
    take raw uint8 pixels — the host→device transfer per request drops 4×
    (f32 368² batch-8 is 13 MB; uint8 is 3.2 MB).  The server auto-detects
    the input dtype from the artifact avals (cli/serve.py) and skips
    host-side normalization.  A ``forward`` override composes: it still
    receives normalized f32.
    Returns the serialized bytes (also written to ``path`` when given).
    """
    from jax import export as jax_export

    from unipose_tpu.train.steps import preprocess_images

    in_dtype = jnp.uint8 if raw_uint8 else jnp.float32

    def prep(x):
        return preprocess_images(x.astype(jnp.float32)) if raw_uint8 else x

    if video:
        b, t, h, w, c = input_shape

        if forward is not None:
            inner = forward
        else:

            def inner(frames, centermap):
                return model.apply(variables, frames, centermap, train=False)

        def fwd(frames, centermap):
            return inner(prep(frames), centermap)

        args = (
            jax.ShapeDtypeStruct(input_shape, in_dtype),
            jax.ShapeDtypeStruct((b, t, h, w, 1), jnp.float32),
        )
    else:
        if forward is not None:
            inner = forward
        else:

            def inner(x):
                return model.apply(variables, x, train=False)

        def fwd(x):
            return inner(prep(x))

        args = (jax.ShapeDtypeStruct(input_shape, in_dtype),)

    exported = jax_export.export(jax.jit(fwd))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


# --------------------------------------------------------------------------
# Streaming video artifacts: a pair of chunk programs that carry the ConvLSTM
# state, so a server can run arbitrarily long videos in fixed-T chunks with
# constant memory (the artifact twin of eval/video.py::make_stream_step).
# Container layout: MAGIC + u64 init_len + init_blob + u64 cont_len + cont_blob.
# --------------------------------------------------------------------------

STREAM_MAGIC = b"UPSTREAM1"


def export_video_stream(
    model,
    variables,
    chunk_shape: Tuple[int, ...],
    *,
    path: Optional[str] = None,
    raw_uint8: bool = False,
) -> bytes:
    """Export the streaming chunk pair for a video model.

    chunk_shape: (B, T, H, W, 3) — the fixed chunk geometry.
      init: (frames, centermap) -> (heat, cell, hide)   [frame 0 via ConvLSTM0]
      cont: (frames, centermap, cell, hide) -> (heat, cell, hide)
    Heat is (B, T, H/8, W/8, K+1); state is the f32 (cell, hide) pair carried
    across chunks (models/unipose_lstm.py sows it as ``final_state``).
    ``raw_uint8``: uint8 frame input with the normalization baked in (4× less
    host→device traffic per chunk; see export_inference).
    """
    import struct

    from jax import export as jax_export

    from unipose_tpu.train.steps import preprocess_images

    b, t, h, w, _ = chunk_shape
    in_dtype = jnp.uint8 if raw_uint8 else jnp.float32

    def prep(x):
        return preprocess_images(x.astype(jnp.float32)) if raw_uint8 else x

    def fwd_init(frames, centermap):
        heat, inter = model.apply(
            variables, prep(frames), centermap, train=False,
            mutable=["intermediates"],
        )
        cell, hide = inter["intermediates"]["final_state"][0]
        return heat, cell, hide

    def fwd_cont(frames, centermap, cell, hide):
        heat, inter = model.apply(
            variables,
            prep(frames),
            centermap,
            train=False,
            initial_state=(cell, hide),
            mutable=["intermediates"],
        )
        cell2, hide2 = inter["intermediates"]["final_state"][0]
        return heat, cell2, hide2

    clip_args = (
        jax.ShapeDtypeStruct(chunk_shape, in_dtype),
        jax.ShapeDtypeStruct((b, t, h, w, 1), jnp.float32),
    )
    init_exp = jax_export.export(jax.jit(fwd_init))(*clip_args)
    state_args = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in init_exp.out_avals[1:]
    )
    cont_exp = jax_export.export(jax.jit(fwd_cont))(*clip_args, *state_args)

    b0, b1 = init_exp.serialize(), cont_exp.serialize()
    blob = (
        STREAM_MAGIC
        + struct.pack("<Q", len(b0))
        + b0
        + struct.pack("<Q", len(b1))
        + b1
    )
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def is_stream_artifact(blob: bytes) -> bool:
    return blob.startswith(STREAM_MAGIC)


def load_video_stream(blob: bytes):
    """Deserialize a streaming container; returns (init_exported,
    cont_exported) ``Exported`` objects."""
    import struct

    from jax import export as jax_export

    if not is_stream_artifact(blob):
        raise ValueError("not a streaming video artifact (bad magic)")
    off = len(STREAM_MAGIC)
    (n0,) = struct.unpack_from("<Q", blob, off)
    off += 8
    init_exp = jax_export.deserialize(blob[off : off + n0])
    off += n0
    (n1,) = struct.unpack_from("<Q", blob, off)
    off += 8
    cont_exp = jax_export.deserialize(blob[off : off + n1])
    return init_exp, cont_exp


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
