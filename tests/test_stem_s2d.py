"""Space-to-depth stem: exact equivalence with the standard 7x7/2 stem."""

import numpy as np

import jax
import jax.numpy as jnp

from unipose_tpu.models.layers import Conv
from unipose_tpu.models.resnet import ResNet101, s2d_stem_kernel, space_to_depth


def test_s2d_kernel_equivalence(rng):
    w7 = rng.randn(7, 7, 3, 8).astype(np.float32) * 0.1
    x = rng.randn(2, 64, 64, 3).astype(np.float32)

    std = Conv(8, 7, stride=2, padding=3)
    y_std = std.apply({"params": {"weight": jnp.asarray(w7)}}, jnp.asarray(x))

    w4 = s2d_stem_kernel(w7)
    s2d = Conv(8, 4, stride=1, padding=((2, 1), (2, 1)))
    y_s2d = s2d.apply(
        {"params": {"weight": jnp.asarray(w4)}},
        space_to_depth(jnp.asarray(x), 2),
    )
    assert y_std.shape == y_s2d.shape == (2, 32, 32, 8)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_s2d), rtol=1e-4, atol=1e-5)


def test_backbone_s2d_matches_standard(rng):
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    std = ResNet101(layers=(1, 1, 1, 1))
    v = std.init(jax.random.PRNGKey(0), x, train=False)
    y_std, low_std = std.apply(v, x, train=False)

    s2d = ResNet101(layers=(1, 1, 1, 1), stem_s2d=True)
    v2 = jax.device_get(s2d.init(jax.random.PRNGKey(0), x, train=False))
    # copy everything, transforming the stem kernel
    v = jax.device_get(v)
    v2["params"] = dict(v["params"])
    v2["params"]["conv1_s2d"] = {
        "weight": s2d_stem_kernel(v["params"].pop("conv1")["weight"])
    }
    v2["batch_stats"] = v["batch_stats"]
    y_s2d, low_s2d = s2d.apply(v2, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_std), np.asarray(y_s2d), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(low_std), np.asarray(low_s2d), rtol=1e-4, atol=1e-4
    )
