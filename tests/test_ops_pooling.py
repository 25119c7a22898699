"""Golden tests: ops.pooling vs torch nn.functional pooling."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unipose_tpu.ops.pooling import avg_pool2d, max_pool2d


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("hw", [(92, 92), (46, 46), (368, 368), (33, 47)])
def test_max_pool_3x3_s2_p1(hw, rng):
    x = rng.randn(2, *hw, 4).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 3, 2, 1))
    want = from_nchw(F.max_pool2d(to_nchw(x), 3, 2, 1))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("hw", [(368, 368), (184, 200)])
def test_avg_pool_9x9_s8_p1_count_include_pad(hw, rng):
    x = rng.randn(1, *hw, 2).astype(np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), 9, 8, 1))
    want = from_nchw(F.avg_pool2d(to_nchw(x), 9, 8, 1))  # count_include_pad=True
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_avg_pool_exclude_pad(rng):
    x = rng.randn(1, 24, 24, 2).astype(np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), 9, 8, 1, count_include_pad=False))
    want = from_nchw(F.avg_pool2d(to_nchw(x), 9, 8, 1, count_include_pad=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_centermap_pool_shape():
    # 368 -> 46, the pool_center path (model/uniposeLSTM.py:75,114)
    x = jnp.zeros((1, 368, 368, 1))
    assert avg_pool2d(x, 9, 8, 1).shape == (1, 46, 46, 1)
