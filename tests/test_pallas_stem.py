"""Fused stem Pallas kernel vs the standard conv/BN/ReLU/maxpool ops."""

import numpy as np

import jax
import jax.numpy as jnp

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.ops.pallas.stem import fold_stem_params, fused_stem
from unipose_tpu.ops.pooling import max_pool2d
from flax import linen as nn


class StandardStem(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = Conv(64, 7, stride=2, padding=3, name="conv1")(x)
        x = TorchBatchNorm(name="bn1")(x, use_running_average=True)
        x = nn.relu(x)
        return max_pool2d(x, 3, 2, 1)


def test_fused_stem_matches_standard(rng):
    stem = StandardStem()
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = jax.device_get(stem.init(jax.random.PRNGKey(0), x))
    # non-trivial BN stats
    variables["batch_stats"]["bn1"]["running_mean"] = rng.randn(64).astype(np.float32) * 0.1
    variables["batch_stats"]["bn1"]["running_var"] = (
        np.abs(rng.randn(64)) + 0.5
    ).astype(np.float32)

    want = stem.apply(variables, x)
    folded = fold_stem_params(variables["params"], variables["batch_stats"])
    got = fused_stem(x, folded, interpret=True)
    assert got.shape == want.shape == (2, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
