"""Visualization: keypoint extraction, skeleton rendering, heatmap overlays.

Reference: utils/utils.py —
  * ``get_kpts`` — per-channel argmax (channels 1..K, 0 is background),
    upscaled to image coords (:94-106);
  * ``draw_paint`` — per-dataset limb sequences and colors, line overlay
    blending (:109-197); the LSP/BBC/NTID variants add synthetic "box corner"
    points offset from extremities (:119-126,:152-160) which only apply to
    the bbox-head variant — reproduced when the keypoint list is long enough;
  * ``getOutImages`` — per-channel JET heatmap overlays at input resolution
    (:477-498).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from unipose_tpu.ops.resize import bilinear_resize

LIMB_SEQ = {
    "LSP": [
        [13, 12], [12, 9], [12, 8], [9, 10], [8, 7], [10, 11], [7, 6],
        [12, 3], [12, 2], [2, 1], [1, 0], [3, 4], [4, 5],
    ],
    "MPII": [
        [8, 9], [7, 12], [12, 11], [11, 10], [7, 13], [13, 14], [14, 15],
        [7, 6], [6, 2], [2, 1], [1, 0], [6, 3], [3, 4], [4, 5], [7, 8],
    ],
    "Penn_Action": [
        [0, 1], [0, 2], [1, 2], [1, 3], [2, 4], [3, 5], [4, 6],
        [1, 7], [2, 8], [7, 8], [7, 9], [8, 10], [9, 11], [10, 12],
    ],
    "BBC": [[1, 3], [2, 4], [3, 5], [4, 6], [5, 6]],
}

COLORS = [
    [0, 0, 255], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 255, 0],
    [255, 0, 255], [0, 255, 0], [255, 0, 0], [255, 255, 0], [255, 0, 255],
    [0, 255, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 0],
]


def get_kpts(heatmaps: np.ndarray, img_h: float = 368.0, img_w: float = 368.0):
    """(1, H, W, K+1) or (1, K+1, H, W) heatmaps -> [[x, y], ...] for the K
    joint channels (channel 0 = background skipped)."""
    maps = np.asarray(heatmaps)[0]
    if maps.shape[0] < maps.shape[-1]:  # NCHW slice (C, H, W)
        chw = maps
    else:
        chw = np.moveaxis(maps, -1, 0)
    kpts = []
    for m in chw[1:]:
        h, w = np.unravel_index(m.argmax(), m.shape)
        kpts.append([int(w * img_w / m.shape[1]), int(h * img_h / m.shape[0])])
    return kpts


def draw_paint(
    image,
    kpts: Sequence[Sequence[int]],
    dataset: str,
    out_path: Optional[str] = None,
):
    """Render skeleton over an image (path or BGR array).  Returns the
    rendered array; writes to ``out_path`` when given."""
    if isinstance(image, str):
        image = cv2.resize(cv2.imread(image), (368, 368))
    im = np.ascontiguousarray(image).astype(np.uint8)
    limb_seq = LIMB_SEQ.get(dataset, [])

    for k in kpts:
        cv2.circle(im, (int(k[0]), int(k[1])), radius=3, thickness=-1, color=(0, 0, 255))

    for i, limb in enumerate(limb_seq):
        if max(limb) >= len(kpts):
            continue
        cur = im.copy()
        y0, x0 = kpts[limb[0]]
        y1, x1 = kpts[limb[1]]
        if x0 != 0 and y0 != 0 and x1 != 0 and y1 != 0:
            cv2.line(cur, (y0, x0), (y1, x1), COLORS[i % len(COLORS)], 5)
        im = cv2.addWeighted(im, 0.2, cur, 0.8, 0)

    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        cv2.imwrite(out_path, im)
    return im


def draw_bbox(
    box,
    image,
    heatmaps: Optional[np.ndarray] = None,
    dataset: str = "LSP",
    out_path: Optional[str] = None,
):
    """Render a (center_x, center_y, w, h) box + optional skeleton
    (Reference: utils/utils.py:502-580 ``draw_BBox``)."""
    if isinstance(image, str):
        image = cv2.resize(cv2.imread(image), (368, 368))
    im = np.ascontiguousarray(image).astype(np.uint8)
    cx, cy, bw, bh = [float(v) for v in np.asarray(box).reshape(-1)[:4]]
    p1 = (int(cx - bw / 2), int(cy - bh / 2))
    p2 = (int(cx + bw / 2), int(cy + bh / 2))
    cv2.rectangle(im, p1, p2, (0, 0, 255), 2)
    cv2.circle(im, (int(cx), int(cy)), radius=2, thickness=-1, color=(0, 0, 255))
    if heatmaps is not None:
        kpts = get_kpts(heatmaps)
        im = draw_paint(im, kpts, dataset)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        cv2.imwrite(out_path, im)
    return im


def heatmap_overlays(
    heat: np.ndarray,
    image,
    out_dir: Optional[str] = None,
    prefix: str = "unipose",
) -> List[np.ndarray]:
    """Per-channel JET overlays (utils/utils.py:477-498 / unipose.py:240-246).

    ``heat``: (1, h, w, C) NHWC heatmaps (any resolution — upscaled to the
    image size with the model's exact align-corners resize).
    """
    if isinstance(image, str):
        image = cv2.resize(cv2.imread(image), (368, 368))
    im = np.ascontiguousarray(image).astype(np.uint8)
    h, w = im.shape[:2]
    heat = np.asarray(bilinear_resize(np.asarray(heat, np.float32), (h, w)))[0]
    heat = np.clip(heat, 0.0, None)

    outs = []
    for c in range(heat.shape[-1]):
        cmap = cv2.applyColorMap(np.uint8(255 * heat[:, :, c]), cv2.COLORMAP_JET)
        blended = cv2.addWeighted(im, 0.6, cmap, 0.4, 0)
        outs.append(blended)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            cv2.imwrite(os.path.join(out_dir, f"{prefix}{c}.png"), blended)
    return outs
