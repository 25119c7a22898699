"""Golden tests: device-side Gaussian targets vs the reference math
(reimplemented in numpy from the documented semantics, not imported)."""

import numpy as np

import jax.numpy as jnp

from unipose_tpu.ops.heatmap import gaussian_heatmaps, gaussian_kernel, render_targets


def np_gaussian(size_w, size_h, cx, cy, sigma):
    gridy, gridx = np.mgrid[0:size_h, 0:size_w]
    d2 = (gridx - cx) ** 2 + (gridy - cy) ** 2
    return np.exp(-d2 / 2.0 / sigma / sigma)


def np_targets(kpts, height, width, stride, sigma):
    """Reference target semantics (utils/lsp_lspet_data.py:224-234)."""
    hm = np.zeros((height // stride, width // stride, len(kpts) + 1), np.float32)
    for i, (x, y) in enumerate(kpts):
        cx = int(x) * 1.0 / stride
        cy = int(y) * 1.0 / stride
        h = np_gaussian(width // stride, height // stride, cx, cy, sigma)
        h[h > 1] = 1
        h[h < 0.0099] = 0
        hm[:, :, i + 1] = h
    hm[:, :, 0] = 1.0 - np.max(hm[:, :, 1:], axis=2)
    return hm


def test_gaussian_kernel_matches_reference_math():
    got = np.asarray(gaussian_kernel(46, 46, 12.3, 7.9, 3.0))
    want = np_gaussian(46, 46, 12.3, 7.9, 3.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_render_targets_single(rng):
    kpts = rng.uniform(-5, 370, size=(14, 2)).astype(np.float32)
    got = np.asarray(render_targets(jnp.asarray(kpts), 368, 368, 8, 3.0))
    want = np_targets(kpts, 368, 368, 8, 3.0)
    assert got.shape == (46, 46, 15)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_render_targets_batched(rng):
    kpts = rng.uniform(0, 368, size=(4, 13, 2)).astype(np.float32)
    got = np.asarray(render_targets(jnp.asarray(kpts), 368, 368, 8, 1.0))
    assert got.shape == (4, 46, 46, 14)
    for b in range(4):
        want = np_targets(kpts[b], 368, 368, 8, 1.0)
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)


def test_clamp_floor():
    # far-away joint -> all zeros except background 1
    got = np.asarray(render_targets(jnp.asarray([[2000.0, 2000.0]]), 368, 368, 8, 1.0))
    np.testing.assert_allclose(got[..., 1], 0.0)
    np.testing.assert_allclose(got[..., 0], 1.0)


def test_centermap_fullres(rng):
    # LSP centermap is rendered at full 368 resolution w/ sigma 3
    # (utils/lsp_lspet_data.py:236-240)
    c = np.array([184.0, 190.0], np.float32)
    got = np.asarray(gaussian_heatmaps(jnp.asarray(c), (368, 368), 3.0))
    want = np_gaussian(368, 368, c[0], c[1], 3.0)
    want[want > 1] = 1
    want[want < 0.0099] = 0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
