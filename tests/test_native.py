"""Native C++ decode pipeline vs the Python cv2 path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unipose_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not buildable here"
)


@pytest.fixture
def images(tmp_path, rng):
    paths = []
    for i in range(6):
        img = rng.randint(0, 255, (100 + i * 7, 120, 3), np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_matches_cv2(images):
    out, statuses = native.decode_batch(images, size=64)
    assert out.shape == (6, 64, 64, 3)
    assert (statuses == 0).all()
    for i, p in enumerate(images):
        want = cv2.resize(cv2.imread(p), (64, 64)).astype(np.float32)
        np.testing.assert_allclose(out[i], want, atol=1.0)  # resize rounding


def test_bottom_right_crop(images, tmp_path, rng):
    big = rng.randint(0, 255, (500, 500, 3), np.uint8)
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, big)
    out, st = native.decode_batch([p], size=368, bottom_right=368)
    want = cv2.imread(p)[-368:, -368:].astype(np.float32)
    np.testing.assert_allclose(out[0], want, atol=1.0)


def test_explicit_crop(images):
    crops = np.array([[10, 5, 50, 60]] * len(images), np.int32)
    out, st = native.decode_batch(images, size=32, crops=crops)
    want = cv2.resize(cv2.imread(images[0])[5:65, 10:60], (32, 32)).astype(
        np.float32
    )
    np.testing.assert_allclose(out[0], want, atol=1.0)


def test_unreadable_file(images, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    out, statuses = native.decode_batch([images[0], bad], size=32)
    assert statuses[0] == 0 and statuses[1] == 1
    assert (out[1] == 0).all()


def test_reused_output_buffer(images):
    buf = np.empty((6, 64, 64, 3), np.float32)
    out, _ = native.decode_batch(images, size=64, out=buf)
    assert out is buf


def test_native_image_loader(images, rng):
    from unipose_tpu.data.native_loader import NativeImageLoader

    kpts = rng.rand(6, 14, 3).astype(np.float32)
    loader = NativeImageLoader(
        images, batch_size=4, size=64, meta={"kpts": kpts}
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert batches[1]["image"].shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(batches[0]["kpts"], kpts[:4])
    assert batches[0]["path"] == images[:4]


def test_decode_batch_mem_matches_cv2(rng):
    """From-memory batch decode (the serving path: HTTP bodies hold JPEG
    bytes) must be bit-identical to the cv2 imdecode+resize chain the
    server falls back to, return original dims for keypoint rescale, and
    flag undecodable buffers without failing the batch."""
    imgs = [
        rng.randint(0, 255, (240 + 7 * i, 320 + 5 * i, 3)).astype(np.uint8)
        for i in range(5)
    ]
    bufs = [cv2.imencode(".jpg", im)[1].tobytes() for im in imgs]
    out, statuses, dims = native.decode_batch_mem(bufs, 184, return_dims=True)
    assert statuses.sum() == 0
    for i, b in enumerate(bufs):
        im = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
        ref = cv2.resize(im, (184, 184)).astype(np.float32)
        np.testing.assert_array_equal(out[i], ref)
        assert tuple(dims[i]) == im.shape[:2]

    out2, st2 = native.decode_batch_mem([b"not an image", bufs[0]], 64)
    assert st2[0] == 1 and st2[1] == 0
    assert out2[0].max() == 0.0 and out2[1].max() > 0.0
