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
    to a multiple of ``chunk`` (trailing pad frames are dropped)."""
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
