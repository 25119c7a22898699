"""Detection NMS and IoU (numpy).

Reference: utils/utils.py:583-710 (``non_max_suppression``, ``bbox_iou``,
``bbox_iou_numpy``) — torch-based utilities for the bbox-head variant,
re-expressed in numpy with the same +1 box-area convention and thresholds.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def bbox_iou(box1: np.ndarray, box2: np.ndarray, x1y1x2y2: bool = True) -> np.ndarray:
    """IoU with the reference's +1 area convention (utils/utils.py:680-710)."""
    box1 = np.atleast_2d(np.asarray(box1, np.float64))
    box2 = np.atleast_2d(np.asarray(box2, np.float64))
    if not x1y1x2y2:
        b1 = np.stack(
            [
                box1[:, 0] - box1[:, 2] / 2, box1[:, 1] - box1[:, 3] / 2,
                box1[:, 0] + box1[:, 2] / 2, box1[:, 1] + box1[:, 3] / 2,
            ],
            axis=1,
        )
        b2 = np.stack(
            [
                box2[:, 0] - box2[:, 2] / 2, box2[:, 1] - box2[:, 3] / 2,
                box2[:, 0] + box2[:, 2] / 2, box2[:, 1] + box2[:, 3] / 2,
            ],
            axis=1,
        )
    else:
        b1, b2 = box1, box2

    ix1 = np.maximum(b1[:, 0], b2[:, 0])
    iy1 = np.maximum(b1[:, 1], b2[:, 1])
    ix2 = np.minimum(b1[:, 2], b2[:, 2])
    iy2 = np.minimum(b1[:, 3], b2[:, 3])
    inter = np.clip(ix2 - ix1 + 1, 0, None) * np.clip(iy2 - iy1 + 1, 0, None)
    a1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
    a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
    return inter / (a1 + a2 - inter + 1e-16)


def non_max_suppression(
    prediction: np.ndarray,
    num_classes: int,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
) -> List[Optional[np.ndarray]]:
    """(B, N, 5+num_classes) center-format predictions -> per-image arrays of
    (x1, y1, x2, y2, obj_conf, class_conf, class_pred)
    (utils/utils.py:583-642)."""
    prediction = np.asarray(prediction, np.float64).copy()
    corners = prediction.copy()
    corners[:, :, 0] = prediction[:, :, 0] - prediction[:, :, 2] / 2
    corners[:, :, 1] = prediction[:, :, 1] - prediction[:, :, 3] / 2
    corners[:, :, 2] = prediction[:, :, 0] + prediction[:, :, 2] / 2
    corners[:, :, 3] = prediction[:, :, 1] + prediction[:, :, 3] / 2
    prediction[:, :, :4] = corners[:, :, :4]

    output: List[Optional[np.ndarray]] = [None] * len(prediction)
    for i, image_pred in enumerate(prediction):
        image_pred = image_pred[image_pred[:, 4] >= conf_thres]
        if image_pred.shape[0] == 0:
            continue
        class_conf = image_pred[:, 5 : 5 + num_classes].max(axis=1, keepdims=True)
        class_pred = image_pred[:, 5 : 5 + num_classes].argmax(axis=1)[:, None]
        detections = np.concatenate(
            [image_pred[:, :5], class_conf, class_pred.astype(np.float64)], axis=1
        )
        for c in np.unique(detections[:, -1]):
            dc = detections[detections[:, -1] == c]
            dc = dc[np.argsort(-dc[:, 4], kind="stable")]
            keep = []
            while dc.shape[0]:
                keep.append(dc[0:1])
                if dc.shape[0] == 1:
                    break
                ious = bbox_iou(dc[0:1, :4], dc[1:, :4])
                dc = dc[1:][ious < nms_thres]
            kept = np.concatenate(keep, axis=0)
            output[i] = kept if output[i] is None else np.concatenate(
                [output[i], kept], axis=0
            )
    return output
