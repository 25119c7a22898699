"""Second experiment round for the train step: donation, PRNG impl,
dropout cost, batch shape.

Usage: python scripts/profile_train_variants2.py
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.models.unipose import build_model
from unipose_tpu.train.optim import make_optimizer
from unipose_tpu.train.state import TrainState
from unipose_tpu.train.steps import make_train_step


def make_inputs(model, spec, b, tx):
    size = spec.input_size
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False), jax.random.PRNGKey(0), x0
    )
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(rng.rand(b, size, size, 3).astype(np.float32) * 255),
        "kpts": jax.device_put(
            np.concatenate(
                [rng.rand(b, 14, 2) * size, np.ones((b, 14, 1))], axis=-1
            ).astype(np.float32)
        ),
    }
    return state, batch


def timed_donating(step, state, batch, iters):
    """Per-call loop for a donating jitted step (state buffers consumed each
    call, so chaining must happen through real donation, not fori_loop).
    Syncs once at the end via a scalar fetch."""
    state, m = step(state, batch)  # compile + warm
    jax.block_until_ready((state, m))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    spec = DATASETS["LSP"]
    mc = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(mc)
    tx = make_optimizer(TrainConfig(batch_size=32))

    b = 32
    state, batch = make_inputs(model, spec, b, tx)

    # donate=True (the trainer's real configuration)
    step_d = make_train_step(model, tx, spec, donate=True)
    t = timed_donating(step_d, state, batch, args.iters)
    print(f"full step donate=True        {t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)", flush=True)

    # donate=False per-call (same timing harness, isolates donation itself)
    state, batch = make_inputs(model, spec, b, tx)
    step_nd = make_train_step(model, tx, spec, donate=False)
    t = timed_donating(step_nd, state, batch, args.iters)
    print(f"full step donate=False       {t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)", flush=True)

    # dropout disabled (measurement only: identity-patch flax Dropout)
    from flax import linen as nn

    orig = nn.Dropout.__call__
    nn.Dropout.__call__ = lambda self, x, **kw: x
    try:
        step_nodrop = make_train_step(model, tx, spec, donate=False)
        state, batch = make_inputs(model, spec, b, tx)
        t = timed_donating(step_nodrop, state, batch, args.iters)
        print(f"full step no-dropout         {t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)", flush=True)
    finally:
        nn.Dropout.__call__ = orig

    # batch 48
    state, batch = make_inputs(model, spec, 48, tx)
    t = timed_donating(step_nd, state, batch, args.iters)
    print(f"full step batch 48           {t * 1e3:7.2f} ms  ({48 / t:6.0f} f/s)", flush=True)


if __name__ == "__main__":
    main()
