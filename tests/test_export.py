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
