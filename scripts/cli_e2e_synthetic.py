"""Full-CLI end-to-end learning run on DISK-backed data (round 4).

The learning-validation runs (`train_synthetic.py`) drive the Trainer with
in-memory loaders; this script exercises the exact path a real user runs:
synthetic pose data written to disk in the reference's LSP/LSPET layouts →
`python -m unipose_tpu.cli.train` → production factory (routing the TRAIN
split through the native C++ decode loader when available) → GSPMD trainer
→ per-epoch validation → best-checkpoint save.  Pass = held-out PCK@0.2
climbs past the threshold through the whole stack.

Usage (TPU): python scripts/cli_e2e_synthetic.py [--epochs 40] [--target 0.9]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def write_lsp_layout(root: str, n: int, mode: str, size: int, seed: int):
    """Synthetic pose data in the on-disk layouts the production loaders
    parse: lspet train (images/im%05d.jpg + joints.mat (14,3,N), straight
    visibility) or lsp val (im%04d.jpg + (3,14,N), inverted)."""
    import cv2
    import numpy as np
    import scipy.io

    from unipose_tpu.data.synthetic import SyntheticPoseLoader

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    loader = SyntheticPoseLoader(
        num_samples=n, batch_size=min(n, 64), input_size=size, seed=seed,
        fixed=True,
    )
    i = 0
    if mode == "lspet":
        joints = np.zeros((14, 3, n))
    else:
        joints = np.zeros((3, 14, n))
    for batch in loader:
        for img, kp in zip(batch["image"], batch["kpts"]):
            name = (
                f"im{i + 1:05d}.jpg" if mode == "lspet" else f"im{i + 1:04d}.jpg"
            )
            cv2.imwrite(
                os.path.join(root, "images", name), img.astype(np.uint8)
            )
            if mode == "lspet":
                joints[:, 0, i] = kp[:, 0]
                joints[:, 1, i] = kp[:, 1]
                joints[:, 2, i] = 1.0  # straight visibility
            else:
                joints[0, :, i] = kp[:, 0]
                joints[1, :, i] = kp[:, 1]
                joints[2, :, i] = 0.0  # inverted: 0 = visible
            i += 1
    scipy.io.savemat(os.path.join(root, "joints.mat"), {"joints": joints})
    return root


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-samples", default=512, type=int)
    p.add_argument("--val-samples", default=64, type=int)
    p.add_argument("--epochs", default=40, type=int)
    p.add_argument("--target", default=0.9, type=float)
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--workdir", default="/tmp/cli_e2e_synthetic")
    p.add_argument("--backend", default=None, choices=[None, "cpu"])
    p.add_argument("--devices", default=8, type=int)
    args = p.parse_args(argv)

    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(args.devices)

    size = 368  # the production loaders' fixed resolution
    train_dir = write_lsp_layout(
        os.path.join(args.workdir, "lspet"), args.train_samples, "lspet",
        size, seed=0,
    )
    val_dir = write_lsp_layout(
        os.path.join(args.workdir, "lsp"), args.val_samples, "lsp",
        size, seed=777,
    )
    print(f"disk data: {args.train_samples} train / {args.val_samples} val",
          flush=True)

    # the exact user entry point, argv and all
    from unipose_tpu.cli import train as cli_train
    from unipose_tpu.train.trainer import Trainer

    cli_args = cli_train.build_argparser().parse_args([
        "--dataset", "LSP",
        "--train_dir", train_dir,
        "--val_dir", val_dir,
        "--batch_size", str(args.batch),
        "--lr", str(args.lr),
        "--sigma", "1.5",
        "--epochs", str(args.epochs),
        "--bf16",
        "--model_name", os.path.join(args.workdir, "unipose_e2e"),
    ])
    model_config, train_config = cli_train.configs_from_args(cli_args)
    trainer = Trainer(
        model_config,
        train_config,
        train_dir=cli_args.train_dir,
        val_dir=cli_args.val_dir,
    )
    from unipose_tpu.data.native_loader import _NativeShuffledBatches

    native_train = isinstance(trainer.train_loader, _NativeShuffledBatches)
    print(f"train loader: {'native C++' if native_train else 'python'}",
          flush=True)

    t0 = time.time()
    result = {"epochs_to_target": None, "native_train_loader": native_train}
    for epoch in range(args.epochs):
        loss = trainer.training(epoch)
        trainer.validation(epoch)
        print(
            f"[epoch {epoch}] loss {loss:.5f} PCK@0.2 {trainer.best_pck:.4f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if trainer.best_pck >= args.target:
            result["epochs_to_target"] = epoch + 1
            break
    result.update(
        pck=round(float(trainer.best_pck), 4),
        pckh=round(float(trainer.best_pckh), 4),
        steps=int(trainer.state.step),
        wall_s=round(time.time() - t0, 1),
        best_ckpt_saved=os.path.exists(
            os.path.join(args.workdir, "unipose_e2e_best")
        ),
    )
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
