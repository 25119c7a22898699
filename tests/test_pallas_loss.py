"""Fused heatmap-MSE Pallas kernel (value + custom-VJP gradient) vs the
materializing reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unipose_tpu.ops.heatmap import render_targets
from unipose_tpu.ops.pallas.heatmap_loss import heatmap_mse


def reference_loss(pred, kpts, stride=8, sigma=3.0, size=368):
    tgt = render_targets(kpts, size, size, stride, sigma)
    return jnp.mean(jnp.square(pred - tgt))


@pytest.mark.parametrize("sigma", [3.0, 1.0])
def test_value_matches(rng, sigma):
    b, k = 3, 14
    pred = jnp.asarray(rng.randn(b, 46, 46, k + 1).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(0, 368, (b, k, 2)).astype(np.float32))
    got = heatmap_mse(pred, kpts, 8, sigma, True)
    want = reference_loss(pred, kpts, sigma=sigma)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_grad_matches(rng):
    b, k = 2, 14
    pred = jnp.asarray(rng.randn(b, 46, 46, k + 1).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(0, 368, (b, k, 2)).astype(np.float32))
    got = jax.grad(lambda p: heatmap_mse(p, kpts, 8, 3.0, True))(pred)
    want = jax.grad(lambda p: reference_loss(p, kpts))(pred)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-7)


def test_offgrid_and_negative_kpts(rng):
    """int() truncation + clamp semantics hold for off-grid joints."""
    b, k = 1, 3
    pred = jnp.zeros((b, 46, 46, k + 1), jnp.float32)
    kpts = jnp.asarray([[[-20.0, 10.0], [9000.0, 9000.0], [100.3, 200.9]]])
    got = heatmap_mse(pred, kpts, 8, 3.0, True)
    tgt = render_targets(kpts, 368, 368, 8, 3.0)
    want = jnp.mean(jnp.square(pred - tgt))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
