"""Int8 front-end quantization (ops/quant.py): BN folding exactness, the
folded front-end graph vs the real ResNet101 modules, and w8a8 drift bounds.

The perf half of the experiment runs on TPU (scripts/profile_int8.py);
these tests pin the math on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.models.resnet import ResNet101
from unipose_tpu.ops import quant


def _randomize_bn(variables, seed=0):
    """Give every BN non-trivial params/stats so folding is actually tested."""
    rng = np.random.RandomState(seed)

    def rand_like(path, leaf):
        name = path[-1].key
        if name in ("running_mean", "bias"):
            return jnp.asarray(rng.randn(*leaf.shape) * 0.2, leaf.dtype)
        if name == "running_var":
            return jnp.asarray(rng.rand(*leaf.shape) * 2 + 0.1, leaf.dtype)
        if name == "weight" and leaf.ndim == 1:  # BN gamma
            return jnp.asarray(rng.rand(*leaf.shape) + 0.5, leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(rand_like, variables)


def test_fold_bn_matches_conv_bn():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 10, 8), jnp.float32)
    conv = Conv(16, 3, stride=2, padding=1)
    bn = TorchBatchNorm()

    cv = conv.init(jax.random.PRNGKey(0), x)
    bv = _randomize_bn(
        bn.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 5, 16)), use_running_average=True),
        seed=2,
    )
    ref = bn.apply(
        bv, conv.apply(cv, x), use_running_average=True
    )

    fc = quant.fold_bn(
        cv["params"]["weight"],
        bv["params"],
        bv["batch_stats"],
        stride=2,
        padding=1,
    )
    got = jax.lax.conv_general_dilated(
        x, fc.w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + fc.b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def frontend():
    """ResNet101 with randomized BN; f32 reference output of layer2 captured
    via flax intermediates."""
    model = ResNet101(dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray((rng.rand(2, 96, 96, 3) * 255 - 128) / 256, jnp.float32)
    variables = _randomize_bn(
        model.init(jax.random.PRNGKey(0), x[:1], train=False), seed=4
    )
    _, inter = model.apply(
        variables,
        x,
        train=False,
        capture_intermediates=lambda mdl, _: mdl.name == "layer2",
    )
    ref = inter["intermediates"]["layer2"]["__call__"][0]
    return model, variables, x, ref


def test_frontend_f32_matches_model(frontend):
    _, variables, x, ref = frontend
    folded = quant.fold_frontend(variables)
    out = quant.frontend_f32(folded, x)
    assert out.shape == ref.shape == (2, 12, 12, 512)
    # folding reassociates (w*s) vs (conv then scale) in f32 — a few ulps per
    # conv, amplified through 7 residual blocks
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-3)


def test_int8_frontend_drift_bounded(frontend):
    _, variables, x, ref = frontend
    folded = quant.fold_frontend(variables)
    scales = quant.calibrate_frontend(folded, x)
    assert set(scales) == {
        "input",
        "stem",
        *(
            f"layer{L}.{i}.{p}"
            for L, n in ((1, 3), (2, 4))
            for i in range(n)
            for p in ("relu1", "relu2", "out")
        ),
    }
    qconvs = quant.quantize_frontend(folded)
    out = jax.jit(lambda x: quant.frontend_int8(qconvs, scales, x))(x)
    assert out.dtype == jnp.float32
    rel = float(
        jnp.linalg.norm((out - ref).ravel()) / jnp.linalg.norm(ref.ravel())
    )
    # w8a8 through 8 requant points: a few percent relative error is the
    # expected regime; catching gross breakage (wrong scale wiring) is the
    # point of the bound.
    assert rel < 0.08, rel


def test_int8_image_forward_matches_model():
    """The assembled int8-frontend UniPose forward (models/quantized.py) must
    track the real model: identical graph from layer3 on, bounded drift from
    the quantized front end."""
    from unipose_tpu.models.quantized import int8_forward_fn
    from unipose_tpu.models.unipose import UniPose

    model = UniPose(num_classes=14, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    x = jnp.asarray((rng.rand(2, 96, 96, 3) * 255 - 128) / 256, jnp.float32)
    variables = _randomize_bn(
        jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(1), x[:1]
        ),
        seed=8,
    )
    ref = model.apply(variables, x, train=False)

    _, forward = int8_forward_fn(variables, x, num_classes=14, dtype=jnp.float32)
    out = forward(x)
    assert out.shape == ref.shape == (2, 12, 12, 15)
    rel = float(jnp.linalg.norm((out - ref).ravel()) / jnp.linalg.norm(ref.ravel()))
    assert rel < 0.08, rel


def test_int8_video_forward_matches_model():
    """The assembled int8-frontend UniPose-LSTM forward must track the real
    video model (identical scan/head graph, bounded front-end drift)."""
    from unipose_tpu.models.quantized import int8_video_forward_fn
    from unipose_tpu.models.unipose_lstm import UniPoseLSTM

    model = UniPoseLSTM(num_classes=13, dtype=jnp.float32)
    rng = np.random.RandomState(9)
    b, t, size = 1, 3, 96
    frames = jnp.asarray((rng.rand(b, t, size, size, 3) * 255 - 128) / 256, jnp.float32)
    centermap = jnp.asarray(rng.rand(b, t, size, size, 1), jnp.float32)
    variables = _randomize_bn(
        jax.jit(lambda k, f, c: model.init(k, f, c, train=False))(
            jax.random.PRNGKey(2), frames, centermap
        ),
        seed=10,
    )
    ref = model.apply(variables, frames, centermap, train=False)

    _, forward = int8_video_forward_fn(
        variables, frames, num_classes=13, dtype=jnp.float32
    )
    out = forward(frames, centermap)
    assert out.shape == ref.shape == (b, t, size // 8, size // 8, 14)
    rel = float(jnp.linalg.norm((out - ref).ravel()) / jnp.linalg.norm(ref.ravel()))
    assert rel < 0.08, rel


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)
    w_i8, s = quant.quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and s.shape == (8,)
    err = np.abs(np.asarray(w_i8, np.float32) * np.asarray(s) - np.asarray(w))
    # quantization step is s per channel; round-to-nearest error <= s/2
    assert (err <= np.asarray(s) / 2 + 1e-7).all()
