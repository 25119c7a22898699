"""Decompose the image train step's time on the current backend.

Times (chained-in-jit, see bench.chained_timer):
  * forward (train-mode, BN batch stats + dropout) alone
  * value_and_grad (forward + backward) alone
  * the full step (grad + Adam update + state rebuild)
  * the full step with the Pallas fused target+loss kernel
so the 3 deltas (backward cost, optimizer cost, fused-loss gain) are visible
separately.  Usage: python scripts/profile_train.py [batch] [--iters N] [--size S]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import chained_timer_stateful as chained  # noqa: E402
from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.models.unipose import build_model
from unipose_tpu.train.optim import make_optimizer
from unipose_tpu.train.state import TrainState
from unipose_tpu.train.steps import make_train_step, make_targets, mse, preprocess_images


def main():
    p = argparse.ArgumentParser()
    p.add_argument("batch", nargs="?", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--size", type=int, default=368)
    args = p.parse_args()
    b = args.batch

    spec = DATASETS["LSP"]
    if args.size != 368:
        import dataclasses

        spec = dataclasses.replace(spec, input_size=args.size)
    mc = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(mc)
    tc = TrainConfig(batch_size=b)
    tx = make_optimizer(tc)

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

    # ---- forward only (train mode) -------------------------------------
    def fwd_step(st, bt):
        x = preprocess_images(bt["image"])
        targets = make_targets(bt["kpts"], spec)
        out, _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(st.rng, 0)},
        )
        return st, {"loss": mse(out, targets)}

    t_fwd = chained(fwd_step, state, batch, args.iters)
    print(f"forward(train):    {t_fwd * 1e3:7.2f} ms  ({b / t_fwd:6.0f} f/s)")

    # ---- value_and_grad only -------------------------------------------
    def grad_step(st, bt):
        x = preprocess_images(bt["image"])
        targets = make_targets(bt["kpts"], spec)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(st.rng, 0)},
            )
            return mse(out, targets), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        gnorm = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        )
        return st, {"loss": loss + 0.0 * gnorm}

    t_grad = chained(grad_step, state, batch, args.iters)
    print(f"fwd+bwd:           {t_grad * 1e3:7.2f} ms  ({b / t_grad:6.0f} f/s)")

    # ---- full step ------------------------------------------------------
    for label, kwargs in (
        ("full step", {}),
        ("full step+fused_loss", {"fused_loss": True}),
    ):
        step = make_train_step(model, tx, spec, donate=False, **kwargs)
        t = chained(step, state, batch, args.iters)
        print(f"{label:<19}{t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)")


if __name__ == "__main__":
    main()
