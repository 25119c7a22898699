"""Learning validation under the CP mesh (VERDICT r3 next-round #1, the
"once under the CPU CP mesh" leg).

Loads the TRAINED video checkpoint from the TPU learning run
(`scripts/train_synthetic.py --variant lstm --save-ckpt ...`, held-out
PCK@0.2 = 99.9%) and, on the 8-device CPU mesh with the real
(data=2, time=4) sequence-parallel sharding:

  1. runs the production validation path on the SHARDED program and
     asserts the held-out PCK@0.2 is preserved (the task-level twin of
     tests/test_cp.py's numeric exactness pins);
  2. takes further CP train steps and shows the loss keeps decreasing —
     the sharded program trains, at trained-checkpoint conditioning (the
     regime test_cp.py cannot reach from random init).

Usage:
    python scripts/cp_learning_check.py --ckpt /tmp/unipose_lstm_184.msgpack
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, type=str)
    p.add_argument("--size", default=184, type=int)
    p.add_argument("--frame-memory", default=4, type=int,
                   help="must divide the time axis (4); the T=5 checkpoint "
                        "params are shape-independent")
    p.add_argument("--val-clips", default=8, type=int)
    p.add_argument("--train-steps", default=4, type=int)
    p.add_argument("--devices", default=8, type=int)
    p.add_argument("--min-pck", default=0.95, type=float)
    p.add_argument("--out", default=None, type=str)
    args = p.parse_args(argv)

    from unipose_tpu.utils.platform import force_cpu_platform

    force_cpu_platform(args.devices)

    from flax import serialization

    from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
    from unipose_tpu.data.synthetic import make_loaders
    from unipose_tpu.train.trainer import Trainer

    t_frames = args.frame_memory
    mc = ModelConfig(
        dataset="LSP",
        num_classes=14,
        variant="lstm",
        frame_memory=t_frames,
        spmd_axes=("data", "time"),
    )
    tc = TrainConfig(
        batch_size=2,
        lr=1e-4,
        sigma=1.5,
        model_name="",
        mesh_shape=(2, 4),
        mesh_axes=("data", "time"),
        val_batch_size=2,
    )
    spec = dataclasses.replace(DATASETS["LSP"], input_size=args.size)
    loaders = make_loaders(
        "lstm",
        input_size=args.size,
        train_samples=max(4, args.train_steps * 2),
        val_samples=args.val_clips,
        batch_size=2,
        frame_memory=t_frames,
        seed=777,  # the TPU run's held-out val seed family
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=10)

    src = serialization.msgpack_restore(open(args.ckpt, "rb").read())
    trainer.state = trainer.state.replace(
        params=src["params"], batch_stats=src["batch_stats"]
    )
    from unipose_tpu.parallel.mesh import replicate

    trainer.state = replicate(trainer.state, trainer.mesh)

    print("validating trained checkpoint on the (data=2, time=4) mesh...",
          flush=True)
    mAP = trainer.validation(0)
    pck = trainer.best_pck
    print(f"CP-mesh held-out PCK@0.2 = {pck:.4f} (mAP {mAP:.4f})", flush=True)

    print(f"{args.train_steps * 2} CP train steps...", flush=True)
    l0 = trainer.training(0)
    l1 = trainer.training(1)
    print(f"CP train loss: {l0:.5f} -> {l1:.5f}", flush=True)

    ok = pck >= args.min_pck and l1 <= l0 * 1.05
    result = {
        "cp_mesh": [2, 4],
        "pck": round(float(pck), 4),
        "mAP": round(float(mAP), 4),
        "train_loss_epoch0": round(float(l0), 6),
        "train_loss_epoch1": round(float(l1), 6),
        "pass": bool(ok),
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if not ok:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
