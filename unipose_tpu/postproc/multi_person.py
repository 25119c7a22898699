"""Multi-person postprocessing for the bbox-head model variant.

Reference: utils/uniPose.py:14-199 (``uniPose_kpts``) — supports the
commented-out bounding-box head (model/unipose.py:34-35): the model emits
K+1 joint channels plus 5 box channels (center + 4 corners); peaks on the
box channels enumerate people, then each person's joints are argmaxed inside
their box window.

The peak detector reproduces scipy's
``maximum_filter(x, 3x3) == x`` minus the eroded zero-background
(uniPose.py:57-65) with a plain numpy sliding max — no scipy dependency —
and a jax twin is provided for on-device peak finding.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp
import jax.lax

# first box channel per dataset = num_joints + 1 (uniPose.py:20-49)
BOX_CHANNEL_START = {"LSP": 15, "MPII": 17, "PoseTrack": 18, "NTID": 20}


def _max_filter3(x: np.ndarray) -> np.ndarray:
    """3x3 sliding maximum with edge replication (scipy 'nearest' mode)."""
    p = np.pad(x, 1, mode="edge")
    stacked = [
        p[i : i + x.shape[0], j : j + x.shape[1]]
        for i in range(3)
        for j in range(3)
    ]
    return np.max(stacked, axis=0)


def _binary_erosion3(x: np.ndarray) -> np.ndarray:
    """3x3 full-structure binary erosion with border_value=1."""
    p = np.pad(x.astype(bool), 1, mode="constant", constant_values=True)
    stacked = [
        p[i : i + x.shape[0], j : j + x.shape[1]]
        for i in range(3)
        for j in range(3)
    ]
    return np.logical_and.reduce(stacked)


def detect_peaks(channel: np.ndarray, threshold: float = 0.0) -> List[List[int]]:
    """(H, W) -> [[row, col], ...] peak coords (uniPose.py:52-71)."""
    c = np.asarray(channel, np.float32).copy()
    c[c < threshold] = 0
    local_max = _max_filter3(c) == c
    background = c == 0
    eroded = _binary_erosion3(background)
    peaks = np.logical_xor(local_max, eroded) * c
    rows, cols = np.nonzero(peaks > 0)
    return [[int(r), int(c_)] for r, c_ in zip(rows, cols)]


def detect_peaks_device(channel: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Device twin of :func:`detect_peaks`: (H, W) -> (H, W) bool mask of
    peaks (use jnp.nonzero host-side to enumerate)."""
    c = jnp.where(channel < threshold, 0.0, channel)
    padded = jnp.pad(c, 1, mode="edge")
    mx = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "VALID"
    )
    local_max = mx == c
    bg = c == 0
    bg_pad = jnp.pad(bg, 1, mode="constant", constant_values=True)
    eroded = (
        jax.lax.reduce_window(
            bg_pad.astype(jnp.float32), jnp.inf, jax.lax.min, (3, 3), (1, 1), "VALID"
        )
        > 0
    )
    return jnp.logical_xor(local_max, eroded) & (c > 0)


def multi_person_kpts(
    maps: np.ndarray,
    dataset: str = "LSP",
    num_joints: int = 14,
    threshold: float = 0.0,
) -> List[List[int]]:
    """(1, C, H, W) heatmaps with box channels -> [[person, x, y], ...]
    (uniPose.py:14-199): per-person joints argmaxed within the
    topLeft..bottomRight window, followed by the 5 box points."""
    mapping = np.asarray(maps)[0]
    start = BOX_CHANNEL_START[dataset]
    center, top_left, bottom_left, top_right, bottom_right = (
        mapping[start + i] for i in range(5)
    )

    kc = detect_peaks(center, threshold)
    ktl = detect_peaks(top_left, threshold)
    kbl = detect_peaks(bottom_left, threshold)
    ktr = detect_peaks(top_right, threshold)
    kbr = detect_peaks(bottom_right, threshold)

    kpts: List[List[int]] = []
    n = min(len(kc), len(ktl), len(kbl), len(ktr), len(kbr))
    for idx in range(n):
        box = mapping[
            :, ktl[idx][0] : kbr[idx][0], ktl[idx][1] : kbr[idx][1]
        ]
        for m in box[1 : num_joints + 1]:
            if m.size == 0:
                kpts.append([idx, ktl[idx][1], ktl[idx][0]])
                continue
            h, w = np.unravel_index(m.argmax(), m.shape)
            kpts.append([idx, int(w + ktl[idx][1]), int(h + ktl[idx][0])])
        kpts.append([idx, kc[idx][1], kc[idx][0]])
        kpts.append([idx, ktl[idx][1], ktl[idx][0]])
        kpts.append([idx, kbl[idx][1], kbl[idx][0]])
        kpts.append([idx, ktr[idx][1], ktr[idx][0]])
        kpts.append([idx, kbr[idx][1], kbr[idx][0]])
    return kpts
