"""Int8 front-end experiment (ROADMAP perf long-tail, VERDICT r2 item 8).

The ResNet front end (stem+layer1+layer2) is 58% of backbone time at 13% of
FLOPs — bandwidth-bound.  This measures, at the model's benchmark shape
(batch 32, 368x368, eval mode):

  * model:  the production path (Conv + eval BatchNorm, bf16),
  * folded: BN folded into conv weights, bf16 (isolates folding vs dtype),
  * int8:   w8a8 with static calibrated activation scales, int32 MXU
            accumulation, f32 epilogues (ops/quant.py),

plus numerical drift of each variant against the f32 folded reference
(max|delta|, relative L2) on He-init weights + identity BN stats — the
synthetic-data half of the study; the accuracy half needs real checkpoints
(docs/ROADMAP.md).

Usage: python scripts/profile_int8.py [batch]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import linen as nn  # noqa: E402

from unipose_tpu.models.layers import Conv, TorchBatchNorm  # noqa: E402
from unipose_tpu.models.resnet import _Stage  # noqa: E402
from unipose_tpu.ops import quant  # noqa: E402
from unipose_tpu.ops.pooling import max_pool2d  # noqa: E402


class FrontEnd(nn.Module):
    """Stem + layer1 + layer2 exactly as ResNet101 builds them."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Conv(64, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn1")(
            x, use_running_average=not train
        )
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, 1)
        x = _Stage(64, [1, 1, 1], [1, 1, 1], True, dtype=self.dtype, name="layer1")(
            x, train=train
        )
        x = _Stage(
            128, [2, 1, 1, 1], [1] * 4, True, dtype=self.dtype, name="layer2"
        )(x, train=train)
        return x


def timeit(fn, *args, iters=20):
    """Chained-in-jit timing (see bench.chained_timer)."""

    @jax.jit
    def loop():
        def body(i, carry):
            out = fn(*(a + carry * 0.0 if a.dtype == jnp.float32 else a for a in args))
            return out.astype(jnp.float32).sum() * 0.0

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop())  # compile + warm
    t0 = time.perf_counter()
    float(loop())
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    # generate on device: host->device transfers are ~MB/s on the TPU tunnel
    x = jax.jit(
        lambda k: (jax.random.uniform(k, (b, 368, 368, 3)) * 255 - 128) / 256
    )(jax.random.PRNGKey(7))

    model = FrontEnd()
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x[:1], train=False
    )
    print(f"batch {b}, input {x.shape}", flush=True)

    # --- production path (bf16 Conv + eval BN) ---
    t_model = timeit(
        lambda x: model.apply(variables, x, train=False).astype(jnp.float32), x
    )
    print(f" model (bf16 conv+BN): {t_model * 1e3:7.2f} ms  ({b / t_model:6.0f} f/s)")

    # --- folded variants ---
    folded = quant.fold_frontend(jax.device_get(variables))
    ref = jax.jit(lambda x: quant.frontend_f32(folded, x))(x)

    t_folded = timeit(
        lambda x: quant.frontend_f32(folded, x, dtype=jnp.bfloat16), x
    )
    out_bf16 = jax.jit(lambda x: quant.frontend_f32(folded, x, dtype=jnp.bfloat16))(x)

    scales = quant.calibrate_frontend(folded, x)
    qconvs = quant.quantize_frontend(folded)
    t_int8 = timeit(lambda x: quant.frontend_int8(qconvs, scales, x), x)
    out_int8 = jax.jit(lambda x: quant.frontend_int8(qconvs, scales, x))(x)

    def drift(out):
        d = (out.astype(jnp.float32) - ref).astype(jnp.float32)
        rel = jnp.linalg.norm(d.ravel()) / jnp.linalg.norm(ref.ravel())
        return float(jnp.max(jnp.abs(d))), float(rel)

    for name, t, out in (
        ("folded bf16", t_folded, out_bf16),
        ("int8 w8a8", t_int8, out_int8),
    ):
        mx, rel = drift(out)
        print(
            f" {name:>20}: {t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)  "
            f"max|d| {mx:.3e}  relL2 {rel:.3e}",
            flush=True,
        )
    print(
        f" int8 vs model: {t_model / t_int8:.2f}x  "
        f"(front end alone; backbone impact = see profile_stages)"
    )

    if "--full" in sys.argv:
        full_model(b, x)
    if "--video" in sys.argv:
        full_video()


def full_model(b, x):
    """Full image model: production bf16 forward vs int8-frontend forward."""
    from bench import zeros_variables
    from unipose_tpu.models.quantized import int8_forward_fn
    from unipose_tpu.models.unipose import UniPose

    model = UniPose(num_classes=14, dtype=jnp.bfloat16)
    variables = zeros_variables(model, x[:1])
    t_prod = timeit(lambda x: model.apply(variables, x, train=False), x)
    print(
        f" full model bf16:      {t_prod * 1e3:7.2f} ms  ({b / t_prod:6.0f} f/s)",
        flush=True,
    )
    _, forward = int8_forward_fn(variables, x, num_classes=14)
    t_q = timeit(forward, x)
    print(
        f" full model int8-fe:   {t_q * 1e3:7.2f} ms  ({b / t_q:6.0f} f/s)  "
        f"=> {t_prod / t_q:.3f}x end-to-end"
    )


def full_video(b=8, t=5):
    """UniPose-LSTM (batch 8 x 5 frames): production bf16 vs int8 front end."""
    from bench import zeros_variables
    from unipose_tpu.models.quantized import int8_video_forward_fn
    from unipose_tpu.models.unipose_lstm import UniPoseLSTM

    frames, cm = jax.jit(
        lambda k: (
            (jax.random.uniform(k, (b, t, 368, 368, 3)) * 255 - 128) / 256,
            jax.random.uniform(jax.random.fold_in(k, 1), (b, t, 368, 368, 1)),
        )
    )(jax.random.PRNGKey(3))
    model = UniPoseLSTM(num_classes=13, dtype=jnp.bfloat16)
    variables = zeros_variables(model, frames[:1, :1], cm[:1, :1])
    t_prod = timeit(lambda f, c: model.apply(variables, f, c, train=False), frames, cm)
    print(
        f" video bf16 (B{b}xT{t}): {t_prod * 1e3:7.2f} ms  "
        f"({b * t / t_prod:6.0f} f/s)",
        flush=True,
    )
    _, forward = int8_video_forward_fn(variables, frames, num_classes=13)
    t_q = timeit(forward, frames, cm)
    print(
        f" video int8-fe:        {t_q * 1e3:7.2f} ms  ({b * t / t_q:6.0f} f/s)  "
        f"=> {t_prod / t_q:.3f}x end-to-end"
    )


if __name__ == "__main__":
    main()
