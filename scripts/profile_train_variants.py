"""One-off experiment harness: where do the train step's non-FLOP ms go?

Variants measured (chained-in-jit, batch configurable):
  * fwd eval-mode (BN frozen to running stats, no dropout)
  * fwd train-mode (baseline: BN batch stats + dropout)
  * fwd+bwd, train-mode vs BN-frozen (isolates BN-train cost both directions)
  * full step at several batch sizes (MXU utilization vs batch)
(dropout cost in isolation is measured by profile_train_variants2.py, which
identity-patches flax Dropout — there is no per-apply toggle to plumb here)

Not part of the bench surface; findings land in docs/BENCHMARKS.md.
Usage: python scripts/profile_train_variants.py [--batches 32,64]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import chained_timer_stateful as chained  # noqa: E402
from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.models.unipose import build_model
from unipose_tpu.train.optim import make_optimizer
from unipose_tpu.train.state import TrainState
from unipose_tpu.train.steps import make_train_step, make_targets, mse, preprocess_images


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


def fwd_variant(model, spec, *, train):
    """Forward-only step: ``train=False`` = BN running stats + no dropout
    (eval mode); ``train=True`` = the training forward (BN batch stats +
    dropout).  Dropout-in-isolation has no per-apply flax toggle — see
    profile_train_variants2.py's identity patch."""

    def step(st, bt):
        x = preprocess_images(bt["image"])
        targets = make_targets(bt["kpts"], spec)
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        if train:
            out, _ = model.apply(
                variables,
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(st.rng, 0)},
            )
        else:
            out = model.apply(variables, x, train=False)
        return st, {"loss": mse(out, targets)}

    return step


def grad_variant(model, spec):
    def step(st, bt):
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

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return st, {"loss": loss + 0.0 * jnp.sum(g0.astype(jnp.float32))}

    return step


def grad_frozen_bn(model, spec):
    """fwd+bwd with BN in eval mode (running stats): isolates the BN-train
    cost in BOTH directions (stat reductions fwd, dgamma/dbeta + recompute
    bwd). Not semantically the training step -- measurement only."""

    def step(st, bt):
        x = preprocess_images(bt["image"])
        targets = make_targets(bt["kpts"], spec)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                x,
                train=False,
            )
            return mse(out, targets)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return st, {"loss": loss + 0.0 * jnp.sum(g0.astype(jnp.float32))}

    return step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,64")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    batches = [int(s) for s in args.batches.split(",")]

    spec = DATASETS["LSP"]
    mc = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(mc)
    tx = make_optimizer(TrainConfig(batch_size=batches[0]))

    b = batches[0]
    state, batch = make_inputs(model, spec, b, tx)

    rows = [
        ("fwd eval-mode (BN frozen, no dropout)", fwd_variant(model, spec, train=False)),
        ("fwd train-mode (baseline)", fwd_variant(model, spec, train=True)),
        ("fwd+bwd train-mode (baseline)", grad_variant(model, spec)),
        ("fwd+bwd BN frozen", grad_frozen_bn(model, spec)),
    ]
    for label, fn in rows:
        t = chained(fn, state, batch, args.iters)
        print(f"{label:<42}{t * 1e3:7.2f} ms  ({b / t:6.0f} f/s)", flush=True)

    for bb in batches:
        st, bt = make_inputs(model, spec, bb, tx)
        step = make_train_step(model, tx, spec, donate=False)
        t = chained(step, st, bt, args.iters)
        print(f"full step batch {bb:<26}{t * 1e3:7.2f} ms  ({bb / t:6.0f} f/s)", flush=True)


if __name__ == "__main__":
    main()
