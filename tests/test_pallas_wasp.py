"""Fused WASP Pallas kernel vs the linen WASP module (eval mode), interpret
mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unipose_tpu.models.wasp import WASP
from unipose_tpu.ops.pallas.wasp_cascade import fold_wasp_params, wasp_cascade


@pytest.mark.parametrize("gap_bn", [True, False])
def test_matches_linen_wasp(rng, gap_bn):
    wasp = WASP(output_stride=16, double_conv2=True, gap_batchnorm=gap_bn)
    x = jnp.asarray(rng.randn(2, 23, 23, 2048).astype(np.float32) * 0.1)
    variables = wasp.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch_stats so BN folding is non-trivial
    variables = jax.device_get(variables)
    bs = variables["batch_stats"]

    def perturb(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == "running_mean":
                tree[k] = rng.randn(*v.shape).astype(np.float32) * 0.1
            elif k == "running_var":
                tree[k] = (np.abs(rng.randn(*v.shape)) + 0.5).astype(np.float32)

    perturb(bs)

    want = wasp.apply(variables, x, train=False)
    folded = fold_wasp_params(
        variables["params"], bs, double_conv2=True, gap_batchnorm=gap_bn
    )
    got = wasp_cascade(x, folded, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_double_conv2_collapse(rng):
    """W2 @ W2 folding == applying conv2 twice."""
    wasp = WASP(output_stride=16, double_conv2=True)
    x = jnp.asarray(rng.randn(1, 23, 23, 2048).astype(np.float32) * 0.1)
    variables = wasp.init(jax.random.PRNGKey(1), x, train=False)
    p = jax.device_get(variables["params"])
    w2 = p["conv2"]["weight"][0, 0]
    folded = fold_wasp_params(p, jax.device_get(variables["batch_stats"]))
    np.testing.assert_allclose(folded["w2eff"], w2 @ w2, rtol=1e-6)
