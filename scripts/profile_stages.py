"""Per-stage timing of the image model on the current backend: backbone vs
WASP vs decoder, to target kernel work where the time actually goes.

Usage: python scripts/profile_stages.py [batch]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unipose_tpu.models.decoder import Decoder
from unipose_tpu.models.resnet import ResNet101
from unipose_tpu.models.wasp import WASP


def zeros_vars(module, *args, **kwargs):
    shapes = jax.eval_shape(
        lambda k, *a: module.init(k, *a, **kwargs), jax.random.PRNGKey(0), *args
    )
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def timeit(apply_fn, variables, *args, iters=20):
    """Chained-in-jit timing (see bench.chained_timer): per-call sync is
    unreliable/expensive through the remote-device tunnel."""

    @jax.jit
    def loop():
        def body(i, carry):
            perturbed = tuple(a + carry * 0.0 for a in args)
            out = apply_fn(variables, *perturbed)
            return jax.tree_util.tree_reduce(
                lambda acc, t: acc + t.astype(jnp.float32).sum(), out, jnp.float32(0)
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop())
    t0 = time.perf_counter()
    float(loop())
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    backbone = ResNet101(dtype=dtype)
    x = jnp.asarray(rng.rand(b, 368, 368, 3), dtype)
    bb_vars = zeros_vars(backbone, x[:1], train=False)
    bb_apply = lambda v, x: backbone.apply(v, x, train=False)  # noqa: E731
    t_bb = timeit(bb_apply, bb_vars, x)
    feats, low = jax.jit(bb_apply)(bb_vars, x)
    print(f"backbone: {t_bb * 1e3:.2f} ms  ({b / t_bb:.0f} f/s)  out={feats.shape}")

    wasp = WASP(dtype=dtype)
    w_vars = zeros_vars(wasp, feats[:1], train=False)
    w_apply = lambda v, x: wasp.apply(v, x, train=False)  # noqa: E731
    t_w = timeit(w_apply, w_vars, feats)
    wout = jax.jit(w_apply)(w_vars, feats)
    print(f"wasp:     {t_w * 1e3:.2f} ms  ({b / t_w:.0f} f/s)  out={wout.shape}")

    dec = Decoder(num_classes=14, dtype=dtype)
    d_vars = zeros_vars(dec, wout[:1], low[:1], train=False)
    d_apply = lambda v, x, l: dec.apply(v, x, l, train=False)  # noqa: E731
    t_d = timeit(d_apply, d_vars, wout, low)
    print(f"decoder:  {t_d * 1e3:.2f} ms  ({b / t_d:.0f} f/s)")

    total = t_bb + t_w + t_d
    print(
        f"sum:      {total * 1e3:.2f} ms  ({b / total:.0f} f/s) "
        f"[bb {t_bb / total:.0%} wasp {t_w / total:.0%} dec {t_d / total:.0%}]"
    )


if __name__ == "__main__":
    main()
