"""jax.export serving-artifact roundtrip on the tiny model."""

import numpy as np

import jax
import jax.numpy as jnp

from unipose_tpu.compat.export import export_inference, load_inference
from unipose_tpu.models.unipose import UniPose

SIZE = 64


def test_export_roundtrip(rng, tmp_path):
    model = UniPose(num_classes=14)
    x = jnp.asarray(rng.randn(1, SIZE, SIZE, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    path = str(tmp_path / "unipose.stablehlo")
    blob = export_inference(model, variables, (1, SIZE, SIZE, 3), path=path)
    assert len(blob) > 1000
    with open(path, "rb") as f:
        assert f.read() == blob

    fn = load_inference(blob)
    got = fn(x)
    want = model.apply(variables, x, train=False)
    # compiled-program variation (fusion order) gives ~1e-4 relative noise on
    # a random-init model whose activations reach 1e5
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-3
    )


def test_export_video_stream_roundtrip(rng, tmp_path):
    """Streaming container: init chunk + cont chunk with carried state must
    reproduce the single full-rollout forward exactly (modulo compiled-
    program rounding)."""
    from unipose_tpu.compat.export import export_video_stream, load_video_stream
    from unipose_tpu.models.unipose_lstm import UniPoseLSTM

    model = UniPoseLSTM(num_classes=13)
    b, t, size = 1, 2, SIZE
    frames = jnp.asarray(rng.rand(b, 2 * t, size, size, 3).astype(np.float32))
    cm = jnp.asarray(rng.rand(b, 2 * t, size, size, 1).astype(np.float32))
    variables = jax.jit(lambda k, f, c: model.init(k, f, c, train=False))(
        jax.random.PRNGKey(0), frames[:, :t], cm[:, :t]
    )

    path = str(tmp_path / "stream.hlo")
    blob = export_video_stream(model, variables, (b, t, size, size, 3), path=path)
    with open(path, "rb") as f:
        assert f.read() == blob

    init_exp, cont_exp = load_video_stream(blob)
    h1, cell, hide = init_exp.call(frames[:, :t], cm[:, :t])
    h2, _, _ = cont_exp.call(frames[:, t:], cm[:, t:], cell, hide)
    got = jnp.concatenate([h1, h2], axis=1)

    want = model.apply(variables, frames, cm, train=False)
    assert got.shape == want.shape == (b, 2 * t, size // 8, size // 8, 14)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-4
    )


def test_export_int8_frontend_roundtrip(rng, tmp_path):
    """--int8_frontend artifacts: the int8-front-end forward exports, loads
    without model code, and matches the live quantized forward."""
    from unipose_tpu.models.quantized import int8_forward_fn

    model = UniPose(num_classes=14)
    x = jnp.asarray(((rng.rand(2, SIZE, SIZE, 3) * 255) - 128) / 256, jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x[:1]
    )
    _, forward = int8_forward_fn(variables, x, num_classes=14, dtype=jnp.float32)

    path = str(tmp_path / "unipose_int8.stablehlo")
    blob = export_inference(
        model, variables, (2, SIZE, SIZE, 3), path=path, forward=forward
    )
    fn = load_inference(blob)
    got = fn(x)
    want = forward(x)
    assert got.shape == (2, SIZE // 8, SIZE // 8, 15)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-3
    )
