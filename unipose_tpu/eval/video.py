"""Streaming evaluation of arbitrarily long videos through the LSTM scan.

BASELINE config 4 ("BBC Pose video eval — long frame sequences through the
LSTM scan"): the reference can only roll 5-frame windows with reset state
(uniposeLSTM.py:106-128); here the compiled chunk step carries (cell, hide)
across fixed-size chunks, so one recurrent state spans the whole video with
constant memory and static shapes.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from unipose_tpu.core.config import DatasetSpec
from unipose_tpu.train.steps import make_centermaps, preprocess_images


def make_stream_step(model, spec: DatasetSpec):
    """Compiled chunk step: (params, batch_stats, frames (B,T,H,W,3) raw,
    centers (B,T,2), state|None) -> (heat (B,T,h,w,K+1), new_state)."""

    @jax.jit
    def first_chunk(params, batch_stats, frames, centers):
        variables = {"params": params, "batch_stats": batch_stats}
        x = preprocess_images(frames)
        cm = make_centermaps(centers, spec)
        heat, inter = model.apply(
            variables, x, cm, train=False, mutable=["intermediates"]
        )
        return heat, inter["intermediates"]["final_state"][0]

    @jax.jit
    def next_chunk(params, batch_stats, frames, centers, state):
        variables = {"params": params, "batch_stats": batch_stats}
        x = preprocess_images(frames)
        cm = make_centermaps(centers, spec)
        heat, inter = model.apply(
            variables,
            x,
            cm,
            train=False,
            initial_state=state,
            mutable=["intermediates"],
        )
        return heat, inter["intermediates"]["final_state"][0]

    def step(params, batch_stats, frames, centers, state=None):
        if state is None:
            return first_chunk(params, batch_stats, frames, centers)
        return next_chunk(params, batch_stats, frames, centers, state)

    return step


def stream_video(
    model,
    params,
    batch_stats,
    frames: np.ndarray,
    centers: np.ndarray,
    spec: DatasetSpec,
    chunk: int = 5,
) -> np.ndarray:
    """Run a full video (1, T_total, H, W, 3) through chunked streaming eval;
    returns (1, T_total, h, w, K+1) heatmaps.  T_total is padded internally
    to a multiple of ``chunk`` (trailing pad frames are dropped).

    The host drives one device call per chunk — right when frames arrive
    incrementally (cameras, decoders).  When the WHOLE video is already in
    memory, ``stream_video_scan`` chains the chunks inside one compiled
    program instead (no per-chunk dispatch; measured 4.6 vs 57 ms/chunk
    through a tunneled host — docs/BENCHMARKS.md long-video study)."""
    b, t_total = frames.shape[:2]
    pad = (-t_total) % chunk
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[:, -1:], pad, 1)], 1)
        centers = np.concatenate([centers, np.repeat(centers[:, -1:], pad, 1)], 1)

    step = make_stream_step(model, spec)
    outs = []
    state = None
    for start in range(0, frames.shape[1], chunk):
        heat, state = step(
            params,
            batch_stats,
            jnp.asarray(frames[:, start : start + chunk]),
            jnp.asarray(centers[:, start : start + chunk]),
            state,
        )
        outs.append(np.asarray(heat))
    return np.concatenate(outs, axis=1)[:, :t_total]


def stream_video_scan(
    model,
    params,
    batch_stats,
    frames,
    centers,
    spec: DatasetSpec,
    chunk: int = 5,
):
    """Device-side twin of :func:`stream_video`: ``lax.scan`` over the
    chunks inside ONE compiled program, threading the (cell, hide) carry —
    zero per-chunk host dispatch, one launch, one fetch.

    frames (B, T_total, H, W, 3) raw, centers (B, T_total, 2); T_total is
    padded to a multiple of ``chunk`` (pad heatmaps dropped).  Memory: all
    chunk heatmaps live on device at once — (B, T_total, h/8, w/8, K+1)
    f32, ~1.6 MB per 368² frame; fine into the thousands of frames.
    Chunked == full-rollout == host-loop equality is pinned in
    tests/test_models.py and at depth in `scripts/bench_long_video.py`.
    """
    b, t_total = frames.shape[:2]
    pad = (-t_total) % chunk
    frames = jnp.asarray(frames)
    centers = jnp.asarray(centers)
    if pad:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[:, -1:], pad, axis=1)], axis=1
        )
        centers = jnp.concatenate(
            [centers, jnp.repeat(centers[:, -1:], pad, axis=1)], axis=1
        )
    n_chunks = frames.shape[1] // chunk

    variables = {"params": params, "batch_stats": batch_stats}

    def chunk_body(carry, fc):
        f, c = fc
        heat, inter = model.apply(
            variables,
            preprocess_images(f),
            make_centermaps(c, spec),
            train=False,
            initial_state=carry,
            mutable=["intermediates"],
        )
        return inter["intermediates"]["final_state"][0], heat

    @jax.jit
    def run(fr, ce):
        # (B, N*chunk, ...) -> chunk-major (N, B, chunk, ...)
        fr = jnp.moveaxis(
            fr.reshape(b, n_chunks, chunk, *fr.shape[2:]), 1, 0
        )
        ce = jnp.moveaxis(
            ce.reshape(b, n_chunks, chunk, *ce.shape[2:]), 1, 0
        )
        # frame 0 of chunk 0 must go through ConvLSTM0 (the reference's
        # iter==0 branch); chunks 1.. consume the carried state
        state0, heat0 = chunk_body(None, (fr[0], ce[0]))
        if n_chunks == 1:
            return heat0
        _, heats = jax.lax.scan(chunk_body, state0, (fr[1:], ce[1:]))
        heats = jnp.moveaxis(heats, 0, 1).reshape(
            b, (n_chunks - 1) * chunk, *heat0.shape[2:]
        )
        return jnp.concatenate([heat0, heats], axis=1)

    return run(frames, centers)[:, :t_total]
