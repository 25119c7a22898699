"""Data-parallel scaling proxy on a virtual CPU mesh.

Runs the full GSPMD image train step at 1/2/4/8 virtual devices with a FIXED
per-device batch (weak scaling) and reports step-time ratios, so sharding
regressions (accidental replication of batch work, missing collectives,
resharding copies) are visible without multi-chip hardware.  Perfect weak
scaling keeps step time flat as devices double; the report's ``efficiency``
is t(1)/t(n) — 1.0 is ideal, and a drop toward 1/n means the batch dimension
stopped being sharded.

This is a *proxy*: CPU "devices" are threads of one host, so absolute times
mean nothing and collective costs are not ICI-realistic.  Real-slice scaling
runs stay parked in docs/ROADMAP.md.

Usage:
    python scripts/scaling_dryrun.py [--devices 1,2,4,8] [--iters 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


from unipose_tpu.utils.platform import force_cpu_platform  # noqa: E402


def run(device_counts=(1, 2, 4, 8), per_device_batch=1, size=64, iters=5):
    """Time the sharded train step over meshes of increasing size; returns
    the report dict.  Assumes the process already has >= max(device_counts)
    CPU devices (call ``force_cpu_platform`` first when standalone)."""
    import dataclasses

    import jax
    import numpy as np

    from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState
    from unipose_tpu.train.steps import make_train_step

    spec = dataclasses.replace(DATASETS["LSP"], input_size=size)
    config = ModelConfig(dataset="LSP", num_classes=14, sync_bn=True)
    model = build_model(config)
    x0 = np.zeros((1, size, size, 3), np.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0
    )
    tx = make_optimizer(TrainConfig(batch_size=per_device_batch))
    base_state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=np.zeros((), np.int32),
        rng=jax.random.PRNGKey(1),
    )

    rows = []
    rng = np.random.RandomState(0)
    for n in device_counts:
        assert n <= len(jax.devices()), (n, jax.devices())
        mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
        state = replicate(base_state, mesh)
        b = n * per_device_batch
        batch = shard_batch(
            {
                "image": rng.rand(b, size, size, 3).astype(np.float32) * 255,
                "kpts": np.concatenate(
                    [
                        rng.rand(b, 14, 2) * size,
                        np.ones((b, 14, 1)),
                    ],
                    axis=-1,
                ).astype(np.float32),
            },
            mesh,
        )
        assert batch["image"].sharding.spec[0] == "data"
        step = make_train_step(model, tx, spec, donate=False)
        state, metrics = step(state, batch)  # compile + warm
        jax.block_until_ready((state, metrics))
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch)
        jax.block_until_ready((state, metrics))
        dt = (time.perf_counter() - t0) / iters
        rows.append(
            {
                "devices": n,
                "global_batch": b,
                "step_ms": round(dt * 1e3, 2),
                "loss": float(metrics["loss"]),
            }
        )

    t1 = rows[0]["step_ms"]
    for r in rows:
        r["efficiency"] = round(t1 / r["step_ms"], 3)
    return {
        "metric": "weak_scaling_cpu_mesh_proxy",
        "per_device_batch": per_device_batch,
        "input_size": size,
        "iters": iters,
        "rows": rows,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--per_device_batch", type=int, default=1)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)
    counts = tuple(int(s) for s in args.devices.split(","))
    force_cpu_platform(max(counts))
    report = run(counts, args.per_device_batch, args.size, args.iters)
    print(json.dumps(report))


if __name__ == "__main__":
    sys.exit(main())
