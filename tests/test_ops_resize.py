"""Golden tests: ops.resize vs torch F.interpolate(align_corners=True).

These are the 3 parity-critical call sites' shapes (WASP GAP 1->23, decoder
23->46, output 46->368) plus randomized shapes.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unipose_tpu.ops.resize import bilinear_resize, resize_matrix


def torch_ref(x_nhwc, out_hw):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())
    y = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=True)
    return np.moveaxis(y.numpy(), 1, -1)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((1, 1), (23, 23)),   # WASP global-avg-pool branch upsample
        ((23, 23), (46, 46)),  # decoder upsample
        ((46, 46), (368, 368)),  # demo/getOutImages upsample
        ((23, 23), (23, 23)),  # identity
        ((17, 31), (46, 46)),
        ((46, 46), (23, 23)),  # downscale
        ((5, 7), (13, 3)),
    ],
)
def test_matches_torch(in_hw, out_hw, rng):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), out_hw))
    want = torch_ref(x, out_hw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rows_are_convex(rng):
    m = np.asarray(resize_matrix(23, 46))
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    assert (m >= 0).all()


def test_extra_leading_dims(rng):
    x = rng.randn(2, 5, 8, 8, 4).astype(np.float32)  # (B, T, H, W, C)
    got = np.asarray(bilinear_resize(jnp.asarray(x), (16, 16)))
    want = torch_ref(x.reshape(10, 8, 8, 4), (16, 16)).reshape(2, 5, 16, 16, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bf16_input_keeps_dtype(rng):
    x = jnp.asarray(rng.randn(1, 23, 23, 8), jnp.bfloat16)
    y = bilinear_resize(x, (46, 46))
    assert y.dtype == jnp.bfloat16
