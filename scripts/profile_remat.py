"""Remat study for long-rollout video BPTT: compile time / step time / memory.

Round-2 found remat_scan (checkpointing the ConvLSTM cell) costs ~7x compile
time (86 s -> >10 min at T=5) — but the cell's activations were never the
memory sink: the per-frame tower (backbone at B*T frames) is.  Round 3 adds
remat_tower (backbone rematerialization, models/unipose_lstm.py) and this
script measures all variants at long T:

  * AOT compile wall time of the train step,
  * XLA memory analysis of the compiled step (temp = activation memory —
    the number remat exists to shrink), without executing,
  * optionally (--run) the executed step time.

Usage: python scripts/profile_remat.py [--t 20] [--batch 1]
           [--variants none,tower] [--run]
"""

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import zeros_variables  # noqa: E402
from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig  # noqa: E402
from unipose_tpu.models.unipose import build_model  # noqa: E402
from unipose_tpu.train.optim import make_optimizer  # noqa: E402
from unipose_tpu.train.state import TrainState  # noqa: E402
from unipose_tpu.train.steps import make_train_step  # noqa: E402

VARIANTS = {
    "none": {},
    "tower": {"remat_tower": True},
    "scan": {"remat_scan": True},
    "both": {"remat_tower": True, "remat_scan": True},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--variants", default="none,tower")
    p.add_argument("--run", action="store_true", help="also execute + time steps")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    b, t, size = args.batch, args.t, args.size

    spec = dataclasses.replace(
        DATASETS["Penn_Action"], input_size=size, frame_memory=t
    )
    tx = make_optimizer(TrainConfig(batch_size=b))

    @jax.jit  # generate on device: host->device is ~MB/s on the TPU tunnel
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "frames": jax.random.uniform(k1, (b, t, size, size, 3)) * 255,
            "kpts": jnp.concatenate(
                [
                    jax.random.uniform(k2, (b, t, 13, 2)) * size,
                    jnp.ones((b, t, 13, 1)),
                ],
                axis=-1,
            ),
            "centers": jax.random.uniform(k3, (b, t, 2)) * size,
        }

    batch = make_batch(jax.random.PRNGKey(0))

    for name in args.variants.split(","):
        mc = ModelConfig(
            dataset="Penn_Action",
            num_classes=13,
            variant="lstm",
            frame_memory=t,
            compute_dtype=jnp.bfloat16,
            **VARIANTS[name],
        )
        model = build_model(mc)
        variables = zeros_variables(
            model,
            jnp.zeros((1, 1, size, size, 3)),
            jnp.zeros((1, 1, size, size, 1)),
        )
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(1),
        )
        step = make_train_step(model, tx, spec, video=True, donate=False)

        t0 = time.perf_counter()
        compiled = step.lower(state, batch).compile()  # step is already jitted
        t_compile = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        line = (
            f"{name:>6}: compile {t_compile:7.1f}s  "
            f"temp(activations) {ma.temp_size_in_bytes / 2**30:6.2f} GiB  "
            f"args {ma.argument_size_in_bytes / 2**30:5.2f} GiB  "
            f"out {ma.output_size_in_bytes / 2**30:5.2f} GiB"
        )
        if args.run:
            new_state, metrics = step(state, batch)
            float(metrics["loss"])  # sync
            t1 = time.perf_counter()
            for _ in range(args.iters):
                new_state, metrics = step(state, batch)
            float(metrics["loss"])
            dt = (time.perf_counter() - t1) / args.iters
            line += f"  step {dt * 1e3:7.1f} ms ({b * t / dt:5.1f} f/s)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
