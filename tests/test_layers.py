"""Golden tests for building blocks vs torch oracles (same weights loaded
into both sides)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unipose_tpu.models.layers import Conv, TorchBatchNorm


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_conv_matches_torch_dilated(rng):
    x = rng.randn(2, 23, 23, 8).astype(np.float32)
    w_oihw = rng.randn(16, 8, 3, 3).astype(np.float32) * 0.1
    m = Conv(16, 3, padding=6, dilation=6)
    params = {"params": {"weight": jnp.asarray(w_oihw.transpose(2, 3, 1, 0))}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = from_nchw(
        F.conv2d(to_nchw(x), torch.from_numpy(w_oihw), padding=6, dilation=6)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_matches_torch_strided_7x7(rng):
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    w = rng.randn(8, 3, 7, 7).astype(np.float32) * 0.1
    m = Conv(8, 7, stride=2, padding=3)
    params = {"params": {"weight": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = from_nchw(F.conv2d(to_nchw(x), torch.from_numpy(w), stride=2, padding=3))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _bn_variables(c, rng):
    return {
        "params": {
            "weight": jnp.asarray(rng.randn(c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        },
        "batch_stats": {
            "running_mean": jnp.asarray(rng.randn(c).astype(np.float32)),
            "running_var": jnp.asarray(np.abs(rng.randn(c)).astype(np.float32) + 0.5),
        },
    }


def _torch_bn(c, variables):
    bn = torch.nn.BatchNorm2d(c)
    bn.weight.data = torch.from_numpy(np.asarray(variables["params"]["weight"]))
    bn.bias.data = torch.from_numpy(np.asarray(variables["params"]["bias"]))
    bn.running_mean.data = torch.from_numpy(
        np.asarray(variables["batch_stats"]["running_mean"])
    )
    bn.running_var.data = torch.from_numpy(
        np.asarray(variables["batch_stats"]["running_var"])
    )
    return bn


def test_batchnorm_eval_matches_torch(rng):
    c = 16
    variables = _bn_variables(c, rng)
    x = rng.randn(2, 9, 9, c).astype(np.float32)
    m = TorchBatchNorm()
    got = np.asarray(m.apply(variables, jnp.asarray(x), use_running_average=True))
    bn = _torch_bn(c, variables).eval()
    want = from_nchw(bn(to_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_matches_torch(rng):
    c = 8
    variables = _bn_variables(c, rng)
    x = rng.randn(4, 7, 7, c).astype(np.float32)
    m = TorchBatchNorm()
    got, updated = m.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    bn = _torch_bn(c, variables).train()
    want = from_nchw(bn(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # running stats after one step (torch: (1-m)*ra + m*batch, unbiased var)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["running_mean"]),
        bn.running_mean.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["running_var"]),
        bn.running_var.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_head_positive_bias_init():
    """``Conv.bias_positive`` (via LSTMHead.positive_bias): biases init at
    the constant +1/sqrt(fan_in) — the dead-ReLU-avoidance opt-in for the
    video head (docs/BENCHMARKS.md round-5 dead-channel study).  Weights
    must be untouched, and the default must stay the torch U(+-bound)."""
    from unipose_tpu.models.unipose_lstm import LSTMHead

    x = jnp.zeros((1, 8, 8, 15), jnp.float32)
    v_def = LSTMHead(14).init(jax.random.PRNGKey(0), x)
    v_pos = LSTMHead(14, positive_bias=True).init(jax.random.PRNGKey(0), x)

    b5 = np.asarray(v_pos["params"]["conv5"]["bias"])
    np.testing.assert_allclose(b5, 128 ** -0.5)  # fan_in = 128*1*1
    b1 = np.asarray(v_pos["params"]["conv1"]["bias"])
    np.testing.assert_allclose(b1, (15 * 11 * 11) ** -0.5)
    for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        np.testing.assert_array_equal(
            np.asarray(v_def["params"][name]["weight"]),
            np.asarray(v_pos["params"][name]["weight"]),
        )
    bd = np.asarray(v_def["params"]["conv5"]["bias"])
    assert (bd < 0).any() and (bd > 0).any()  # default still U(+-bound)
