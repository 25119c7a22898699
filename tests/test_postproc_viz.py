"""Tests for multi-person postproc, NMS, viz, and harness utils."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from unipose_tpu.postproc.multi_person import (
    detect_peaks,
    detect_peaks_device,
    multi_person_kpts,
)
from unipose_tpu.postproc.nms import bbox_iou, non_max_suppression
from unipose_tpu.utils.meters import AverageMeter
from unipose_tpu.utils.logger import Logger


def gaussian_at(h, w, cy, cx, sigma=2.0):
    gy, gx = np.mgrid[0:h, 0:w]
    return np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2) / (2 * sigma**2))


def test_detect_peaks_matches_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.RandomState(0)
    x = gaussian_at(46, 46, 10, 12) + gaussian_at(46, 46, 30, 35)
    x[x < 0.01] = 0
    got = detect_peaks(x)
    # scipy oracle (uniPose.py:57-65)
    structure = scipy_nd.generate_binary_structure(2, 2)
    local_max = scipy_nd.maximum_filter(x, footprint=structure) == x
    background = x == 0
    eroded = scipy_nd.binary_erosion(background, structure=structure, border_value=1)
    peaks = np.logical_xor(local_max, eroded) * x
    want = [[int(r), int(c)] for r, c in zip(*np.nonzero(peaks > 0))]
    assert got == want
    assert len(got) == 2


def test_detect_peaks_device_matches_host():
    x = gaussian_at(46, 46, 5, 40) + gaussian_at(46, 46, 22, 7)
    x[x < 0.01] = 0
    mask = np.asarray(detect_peaks_device(jnp.asarray(x, jnp.float32)))
    got = [[int(r), int(c)] for r, c in zip(*np.nonzero(mask))]
    assert got == detect_peaks(x)


def test_multi_person_kpts_two_people():
    # 20 channels: bg + 14 joints + 5 box channels (LSP layout)
    maps = np.zeros((1, 20, 46, 46), np.float32)
    people = [((10, 10), (4, 4), (16, 4), (4, 16), (16, 16)),
              ((32, 32), (26, 26), (38, 26), (26, 38), (38, 38))]
    for center, tl, bl, tr, br in people:
        for ch, (r, c) in zip(range(15, 20), (center, tl, bl, tr, br)):
            maps[0, ch] += gaussian_at(46, 46, r, c, 1.5)
    # a joint inside each person's box
    maps[0, 1] += gaussian_at(46, 46, 8, 9, 1.0) + gaussian_at(46, 46, 30, 31, 1.0)
    for ch in range(15, 20):
        maps[0, ch][maps[0, ch] < 0.01] = 0

    kpts = multi_person_kpts(maps, "LSP", num_joints=14)
    n_people = kpts[-1][0] + 1
    assert n_people == 2
    assert len(kpts) == 2 * (14 + 5)
    # person 0 joint 0 found near (9, 8) in (x, y)
    assert abs(kpts[0][1] - 9) <= 1 and abs(kpts[0][2] - 8) <= 1


def test_bbox_iou_self_is_one():
    box = np.array([[0, 0, 10, 10]], np.float64)
    np.testing.assert_allclose(bbox_iou(box, box), [1.0])


def test_nms_suppresses_overlaps():
    # two heavily overlapping boxes + one far away, 1 class
    pred = np.zeros((1, 3, 6), np.float64)
    pred[0, 0] = [10, 10, 8, 8, 0.9, 0.8]
    pred[0, 1] = [11, 10, 8, 8, 0.85, 0.7]  # overlaps box 0 -> suppressed
    pred[0, 2] = [40, 40, 8, 8, 0.7, 0.9]
    out = non_max_suppression(pred, num_classes=1, conf_thres=0.5, nms_thres=0.4)
    assert out[0].shape[0] == 2


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, n=2)
    m.update(5.0)
    assert m.avg == pytest.approx(3.0)
    assert m.count == 3


def test_logger_roundtrip(tmp_path):
    path = str(tmp_path / "log.txt")
    with Logger(path, "t") as log:
        log.set_names(["epoch", "loss"])
        log.append([0, 1.5])
        log.append([1, 1.25])
    resumed = Logger(path, resume=True)
    assert resumed.names == ["epoch", "loss"]
    assert resumed.numbers["loss"] == [1.5, 1.25]
    resumed.close()


def test_viz_draw(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from unipose_tpu.viz.draw import draw_paint, get_kpts, heatmap_overlays

    heat = np.zeros((1, 46, 46, 15), np.float32)
    for k in range(1, 15):
        heat[0, k * 3 % 46, k * 2 % 46, k] = 1.0
    kpts = get_kpts(heat)
    assert len(kpts) == 14
    img = (rng.rand(368, 368, 3) * 255).astype(np.uint8)
    out = draw_paint(img, kpts, "LSP", out_path=str(tmp_path / "pose.png"))
    assert out.shape == (368, 368, 3)
    assert os.path.exists(tmp_path / "pose.png")
    overlays = heatmap_overlays(heat, img, out_dir=str(tmp_path / "heat"))
    assert len(overlays) == 15
    assert os.path.exists(tmp_path / "heat" / "unipose0.png")


def test_model_summary_counts():
    from unipose_tpu.utils.summary import count_params, per_module_params

    params = {"a": {"w": np.zeros((2, 3))}, "b": {"w": np.zeros((4,))}}
    assert count_params(params) == 10
    assert per_module_params(params) == {"a": 6, "b": 4}
