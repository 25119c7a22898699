"""Transform parity vs the reference's Mytransforms, loaded directly as an
oracle (with a collections.Iterable shim for py3.10+)."""

import collections
import collections.abc
import importlib.util
import os
import random

import numpy as np
import pytest

from unipose_tpu.data import transforms as T

REF = "/root/reference/utils/Mytransforms.py"
needs_reference = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref():
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    spec = importlib.util.spec_from_file_location("ref_mytransforms", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_inputs(rng, h=40, w=50, k=14):
    img = rng.rand(h, w, 3).astype(np.float32) * 255
    kpt = rng.rand(k, 3) * [[w, h, 1]]
    kpt[:, 2] = rng.randint(0, 2, size=k)
    center = np.array([w / 2 + 3.0, h / 2 - 2.0])
    return img, kpt, center


def tolists(kpt):
    return [list(map(float, row)) for row in kpt]


@needs_reference
def test_resize_scalar_ratio(ref, rng):
    img, kpt, center = make_inputs(rng)
    gi, gk, gc = T.resize(img.copy(), kpt.copy(), center.copy(), 1.7)
    wi, wk, wc = ref.resize(img.copy(), tolists(kpt), list(center), 1.7)
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-6)
    np.testing.assert_allclose(gc, np.asarray(wc), atol=1e-6)


@needs_reference
def test_resize_tuple_ratio_matches_reference_quirk(ref, rng):
    img, kpt, center = make_inputs(rng, h=40, w=40)
    ratio = (368 / 40, 368 / 40)
    gi, gk, gc = T.resize(img.copy(), kpt.copy(), center.copy(), ratio)
    wi, wk, wc = ref.resize(img.copy(), tolists(kpt), list(center), ratio)
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-6)


@needs_reference
def test_resize_narrow_image_padding(ref, rng):
    img, kpt, center = make_inputs(rng, h=40, w=50)
    narrow = img[:, :30].copy()
    gi, _, _ = T.resize(narrow.copy(), kpt.copy(), center.copy(), 1.0)
    wi, _, _ = ref.resize(narrow.copy(), tolists(kpt), list(center), 1.0)
    np.testing.assert_allclose(gi, wi, atol=1e-3)


@needs_reference
def test_rotate(ref, rng):
    img, kpt, center = make_inputs(rng)
    gi, gk, gc = T.rotate(img.copy(), kpt.copy(), center.copy(), 23.0)
    wi, wk, wc = ref.rotate(img.copy(), tolists(kpt), list(center), 23.0)
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-5)
    np.testing.assert_allclose(gc, np.asarray(wc), atol=1e-5)


@needs_reference
@pytest.mark.parametrize("offs", [(5, 3), (-4, -7), (20, 15)])
def test_crop(ref, rng, offs):
    img, kpt, center = make_inputs(rng)
    gi, gk, gc = T.crop(img.copy(), kpt.copy(), center.copy(), offs[0], offs[1], 32, 32)
    wi, wk, wc = ref.crop(img.copy(), tolists(kpt), list(center), offs[0], offs[1], 32, 32)
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-6)
    np.testing.assert_allclose(gc, np.asarray(wc), atol=1e-6)


@needs_reference
def test_hflip_lsp(ref, rng):
    img, kpt, center = make_inputs(rng)
    gi, gk, gc = T.hflip(img.copy(), kpt.copy(), center.copy())
    wi, wk, wc = ref.hflip(img.copy(), tolists(kpt), list(center))
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-6)
    np.testing.assert_allclose(gc, np.asarray(wc), atol=1e-6)


@needs_reference
def test_hflip_bbc_pairs(ref, rng):
    img, kpt, center = make_inputs(rng, k=7)
    gi, gk, gc = T.hflip(
        img.copy(), kpt.copy(), center.copy(),
        swap_pairs=T.SWAP_PAIRS_BBC, check_vis=False,
    )
    wi, wk, wc = ref.hflip_BBC(img.copy(), tolists(kpt), list(center))
    np.testing.assert_allclose(gi, wi, atol=1e-3)
    np.testing.assert_allclose(gk, np.asarray(wk), atol=1e-6)


def test_compose_routes_scale(rng):
    img, kpt, center = make_inputs(rng, h=200, w=200)
    seeded = random.Random(7)
    comp = T.Compose([T.RandomResized(rng=seeded), T.TestResized(368)])
    out_img, out_kpt, out_center = comp(img, kpt, center, scale=0.5)
    assert out_img.shape == (368, 368, 3)


def test_testresized_identity_on_368(rng):
    img = rng.rand(368, 368, 3).astype(np.float32)
    kpt = rng.rand(14, 3) * 100
    out_img, out_kpt, _ = T.TestResized(368)(img, kpt, [10.0, 20.0])
    assert out_img.shape == (368, 368, 3)
    np.testing.assert_allclose(out_kpt, kpt, atol=1e-6)
