"""Synthetic pose data with consistent geometry — the learning-validation
dataset (VERDICT r3 next-round #1).

The reference's only end-to-end correctness evidence is that its training
recipe (Reference: unipose.py:100-193) produces models that hit the paper's
PCK numbers on real data.  Real datasets and released checkpoints cannot be
fetched in this environment, so this module provides the strongest
in-environment substitute: a procedurally rendered stick-figure dataset
whose joints are visually identifiable (each joint carries a unique color
marker) and geometrically consistent (one articulated body model with
random placement/scale/rotation/pose jitter).  A correct implementation of
the COMPOSED training system — loader semantics, device-side Gaussian
targets, LR schedule, BN/EMA-vs-donation interaction, dropout keys, loss,
eval argmax — must drive held-out PCK@0.2 to ~1.0 on this data; silent bugs
in any of those parts hold it down.  Scored by the same metric path as real
data (eval/metrics.py, oracle-pinned against the reference evaluate.py).

Everything is deterministic from (seed, epoch): epoch e of the train split
regenerates the same batches, and the val split is fixed.

Layout matches the production loaders: LSP joint order (14 joints,
utils/lsp_lspet_data.py), images raw BGR-ish uint8 0..255 channel-last,
``kpts`` (K, 3) with visibility in [:, 2]; the video variant emits
(B, T, ...) clips with per-frame centers like data/penn_action.py.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

# Canonical LSP-order skeleton in unit body coordinates (x right, y down,
# origin at pelvis midpoint).  Indices: 0 R ankle, 1 R knee, 2 R hip,
# 3 L hip, 4 L knee, 5 L ankle, 6 R wrist, 7 R elbow, 8 R shoulder,
# 9 L shoulder, 10 L elbow, 11 L wrist, 12 neck, 13 head top.
_SKELETON = np.array(
    [
        (-0.16, 0.95),   # 0  right ankle
        (-0.14, 0.55),   # 1  right knee
        (-0.12, 0.10),   # 2  right hip
        (0.12, 0.10),    # 3  left hip
        (0.14, 0.55),    # 4  left knee
        (0.16, 0.95),    # 5  left ankle
        (-0.42, 0.05),   # 6  right wrist
        (-0.33, -0.30),  # 7  right elbow
        (-0.20, -0.60),  # 8  right shoulder
        (0.20, -0.60),   # 9  left shoulder
        (0.33, -0.30),   # 10 left elbow
        (0.42, 0.05),    # 11 left wrist
        (0.0, -0.68),    # 12 neck
        (0.0, -0.95),    # 13 head top
    ],
    np.float32,
)

_LIMBS = (
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
    (6, 7), (7, 8), (8, 12), (12, 9), (9, 10), (10, 11),
    (2, 12), (3, 12), (12, 13),
)

# Side-distinct limb strokes (BGR).  Right-side limbs, left-side limbs and
# the midline get different colors: without this the figure is bilaterally
# symmetric up to the small joint markers, and the VIDEO variant — whose
# supervision is squeezed through the 16-channel ConvLSTM bottleneck —
# reliably falls into a mirror local minimum (both channels of a left/right
# pair predicted at one side; measured: PCK pinned at exactly 8/14 with a
# binary per-joint pattern, while the image variant trains past 95%).
# Real datasets break this symmetry with appearance; synthetic data must
# break it explicitly for the convergence claim to be testable.
_RIGHT_JOINTS = frozenset((0, 1, 2, 6, 7, 8))
_LEFT_JOINTS = frozenset((3, 4, 5, 9, 10, 11))


def _limb_color(a: int, b: int) -> np.ndarray:
    if a in _RIGHT_JOINTS and b in _RIGHT_JOINTS:
        return np.array((60.0, 60.0, 190.0), np.float32)  # right: red-ish
    if a in _LEFT_JOINTS and b in _LEFT_JOINTS:
        return np.array((190.0, 90.0, 40.0), np.float32)  # left: blue-ish
    return np.array((90.0, 90.0, 90.0), np.float32)       # midline: gray

# One saturated, unique marker color per joint (BGR, matching the loaders'
# channel convention) — joint identity is decodable from local appearance,
# which is what makes the task easy enough to demand near-perfect PCK.
_COLORS = np.array(
    [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
        (255, 0, 255), (0, 255, 255), (128, 255, 0), (255, 128, 0),
        (0, 128, 255), (128, 0, 255), (255, 0, 128), (0, 255, 128),
        (255, 255, 255), (128, 128, 255),
    ],
    np.float32,
)

NUM_JOINTS = 14


def _render_sample(rng: np.random.RandomState, size: int):
    """One figure: returns (image (size, size, 3) float32 0..255,
    kpts (14, 3) float32 pixel coords + visibility=1, center (2,))."""
    # placement: keep every joint well inside the border (border-adjacent
    # targets are masked by the metric's visibility gate, evaluate.py:12-17)
    scale = size * rng.uniform(0.30, 0.42)
    theta = np.deg2rad(rng.uniform(-18.0, 18.0))
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    )
    pts = _SKELETON + rng.normal(0.0, 0.015, _SKELETON.shape).astype(np.float32)
    pts = pts @ rot.T * scale
    lo, hi = pts.min(0), pts.max(0)
    margin = 0.08 * size
    cx = rng.uniform(margin - lo[0], size - margin - hi[0])
    cy = rng.uniform(margin - lo[1], size - margin - hi[1])
    pts = pts + np.array([cx, cy], np.float32)

    img = _render_from_kpts(pts, size, rng)
    kpts = np.concatenate([pts, np.ones((NUM_JOINTS, 1), np.float32)], axis=1)
    center = np.array([cx, cy], np.float32)
    return img, kpts, center


@dataclasses.dataclass
class SyntheticPoseLoader:
    """Image-variant loader with the Trainer's loader protocol
    (__len__/set_epoch/__iter__ yielding dict batches; ``batch_size``
    attribute for the padded validation path).

    Each sample is a fixed function of (seed, index), rendered once and
    cached — epochs only reshuffle batch composition (``fixed=True``, the
    val split, keeps dataset order).  Rendering is host numpy; caching
    keeps the 1-vCPU host out of the training loop's critical path."""

    num_samples: int = 256
    batch_size: int = 8
    input_size: int = 184
    seed: int = 0
    fixed: bool = False  # val split: identical order every epoch

    def __post_init__(self):
        self._epoch = 0
        self._cache = {}

    def __len__(self) -> int:
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _sample(self, index: int):
        if index not in self._cache:
            rng = np.random.RandomState(
                (self.seed * 1_000_003 + index) % (2**31 - 1)
            )
            img, kp, _ = _render_sample(rng, self.input_size)
            self._cache[index] = (img, kp)
        return self._cache[index]

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(self.num_samples)
        if not self.fixed:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        for start in range(0, self.num_samples, self.batch_size):
            idx = order[start : start + self.batch_size]
            samples = [self._sample(int(i)) for i in idx]
            yield {
                "image": np.stack([s[0] for s in samples]),
                "kpts": np.stack([s[1] for s in samples]),
            }


@dataclasses.dataclass
class SyntheticVideoLoader:
    """Video-variant loader: T-frame clips of one figure translating with
    constant velocity (joint positions fully predictable from appearance;
    motion exercises the ConvLSTM carry)."""

    num_clips: int = 64
    batch_size: int = 2
    frame_memory: int = 5
    input_size: int = 184
    seed: int = 0
    fixed: bool = False

    def __post_init__(self):
        self._epoch = 0
        self._cache = {}

    def __len__(self) -> int:
        return (self.num_clips + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _render_clip(self, index: int):
        rng = np.random.RandomState(
            (self.seed * 1_000_003 + index) % (2**31 - 1)
        )
        size, t = self.input_size, self.frame_memory
        img0, kp0, c0 = _render_sample(rng, size)
        vel = rng.uniform(-0.015 * size, 0.015 * size, 2).astype(np.float32)
        frames, kpts, centers = [img0], [kp0], [c0]
        for _ in range(1, t):
            prev_k = kpts[-1]
            shift = vel
            # keep in bounds: reflect when the figure would leave the margin
            nk = prev_k[:, :2] + shift
            if nk.min() < 0.04 * size or nk.max() > 0.96 * size:
                vel = -vel
                nk = prev_k[:, :2] + vel
            k = np.concatenate([nk, np.ones((NUM_JOINTS, 1), np.float32)], 1)
            frames.append(_render_from_kpts(nk, size, rng))
            kpts.append(k)
            centers.append(centers[-1] + vel)
        return np.stack(frames), np.stack(kpts), np.stack(centers)

    def _clip(self, index: int):
        if index not in self._cache:
            self._cache[index] = self._render_clip(index)
        return self._cache[index]

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(self.num_clips)
        if not self.fixed:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        for start in range(0, self.num_clips, self.batch_size):
            idx = order[start : start + self.batch_size]
            clips = [self._clip(int(i)) for i in idx]
            yield {
                "frames": np.stack([c[0] for c in clips]),
                "kpts": np.stack([c[1] for c in clips]),
                "centers": np.stack([c[2] for c in clips]),
            }


def _render_from_kpts(
    pts: np.ndarray, size: int, rng: np.random.RandomState
) -> np.ndarray:
    """Render one frame for given joint pixel positions: background clutter,
    side-colored limb strokes, unique per-joint color markers."""
    img = np.full((size, size, 3), 32.0, np.float32)
    # light background clutter so the net cannot key on raw brightness
    for _ in range(6):
        x0, y0 = rng.randint(0, size, 2)
        w, h = rng.randint(2, max(3, size // 8), 2)
        img[y0 : y0 + h, x0 : x0 + w] += rng.uniform(0, 40)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for a, b in _LIMBS:
        pa, pb = pts[a], pts[b]
        d = pb - pa
        L2 = float(d @ d) + 1e-6
        t = np.clip(((xx - pa[0]) * d[0] + (yy - pa[1]) * d[1]) / L2, 0.0, 1.0)
        dist2 = (xx - (pa[0] + t * d[0])) ** 2 + (yy - (pa[1] + t * d[1])) ** 2
        img[dist2 < (0.012 * size) ** 2] = _limb_color(a, b)
    r2 = (0.022 * size) ** 2
    for j in range(NUM_JOINTS):
        mask = (xx - pts[j, 0]) ** 2 + (yy - pts[j, 1]) ** 2 < r2
        img[mask] = _COLORS[j]
    return np.clip(img + rng.normal(0, 4.0, img.shape), 0, 255).astype(np.float32)


def make_loaders(
    variant: str = "image",
    *,
    input_size: int = 184,
    train_samples: int = 256,
    val_samples: int = 64,
    batch_size: int = 8,
    val_batch_size: Optional[int] = None,
    frame_memory: int = 5,
    seed: int = 0,
):
    """(train_loader, val_loader, None) for Trainer(loaders=...)."""
    vb = val_batch_size or batch_size
    if variant == "lstm":
        return (
            SyntheticVideoLoader(
                num_clips=train_samples,
                batch_size=batch_size,
                frame_memory=frame_memory,
                input_size=input_size,
                seed=seed,
            ),
            SyntheticVideoLoader(
                num_clips=val_samples,
                batch_size=vb,
                frame_memory=frame_memory,
                input_size=input_size,
                seed=seed + 777,
                fixed=True,
            ),
            None,
        )
    return (
        SyntheticPoseLoader(
            num_samples=train_samples,
            batch_size=batch_size,
            input_size=input_size,
            seed=seed,
        ),
        SyntheticPoseLoader(
            num_samples=val_samples,
            batch_size=vb,
            input_size=input_size,
            seed=seed + 777,
            fixed=True,
        ),
        None,
    )
