"""Full-CLI end-to-end VIDEO learning run on DISK-backed data (round 5,
VERDICT r4 next-round #1).

The image twin (`cli_e2e_synthetic.py`) proved the disk → `cli.train` →
factory → GSPMD trainer path learns to 96.8% PCK; the video half of the
system — the reference's flagship use case (uniposeLSTM.py:100-215) — was
only fixture-smoke-tested.  This script closes that gap: synthetic video
clips written to disk in the reference's on-disk Penn Action layout
(per-index ``.npy`` dicts with nframes / framepath / dimensions / x / y /
visibility — penn_action_data.py:49-56; frames as
``frames/<clip>/%06d.jpg``, 1-indexed) → the exact user entry point
(`cli.train` argparse, ``--dataset Penn_Action --model_arch uniposeLSTM``)
→ production factory (batch_size→frame_memory quirk, clip batching) → Penn
loader (random seq windows in train, deterministic in eval) → GSPMD video
trainer → per-frame batched validation → best-checkpoint save.  Pass =
held-out PCK@0.2 climbs past the threshold through the whole stack.

Recipe notes: lr stays at the reference's 1e-4 scale — the video head's
output ReLU kills channels at larger lrs (docs/BENCHMARKS.md "Video-variant
findings"); sigma is the video default 1.0 (uniposeLSTM.py:55 via the CLI
default).

Usage (TPU, ~20 min): python scripts/cli_e2e_video_synthetic.py
Usage (CPU mesh smoke): python scripts/cli_e2e_video_synthetic.py \
    --backend cpu --devices 8 --size 64 --train-clips 8 --val-clips 4 \
    --batch 2 --epochs 2 --target 0
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def write_penn_layout(
    root: str, split: str, n_clips: int, nframes: int, size: int, seed: int,
    first_id: int = 1,
):
    """Synthetic clips in the reference's on-disk Penn Action layout
    (penn_action_data.py:35-56): ``<root>/<split>/NNNN.npy`` label dicts +
    ``<root>/frames/NNNN/%06d.jpg`` frames (1-indexed)."""
    import cv2
    import numpy as np

    from unipose_tpu.data.synthetic import SyntheticVideoLoader

    os.makedirs(os.path.join(root, split), exist_ok=True)
    loader = SyntheticVideoLoader(
        num_clips=n_clips, batch_size=1, frame_memory=nframes,
        input_size=size, seed=seed, fixed=True, dataset="Penn_Action",
    )
    for idx, batch in enumerate(loader):
        frames = batch["frames"][0]   # (nframes, size, size, 3) f32 0..255
        kpts = batch["kpts"][0]       # (nframes, 13, 3)
        clip = f"{first_id + idx:04d}"
        frame_dir = os.path.join(root, "frames", clip)
        os.makedirs(frame_dir, exist_ok=True)
        for i, frame in enumerate(frames):
            cv2.imwrite(
                os.path.join(frame_dir, "%06d.jpg" % (i + 1)),
                frame.astype(np.uint8),
            )
        np.save(
            os.path.join(root, split, clip + ".npy"),
            {
                "nframes": nframes,
                "framepath": os.path.join(root, "frames", clip),
                "dimensions": [size, size],  # [h, w], penn_action_data.py:53
                "x": kpts[:, :, 0].astype(np.float64),
                "y": kpts[:, :, 1].astype(np.float64),
                "visibility": kpts[:, :, 2].astype(np.int64),
            },
        )
    return root


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-clips", default=128, type=int)
    p.add_argument("--val-clips", default=32, type=int)
    p.add_argument("--train-nframes", default=7, type=int,
                   help="frames per train clip on disk; > frame_memory so "
                        "the random window start (penn_action_data.py:60) "
                        "actually varies")
    p.add_argument("--frame-memory", default=5, type=int)
    p.add_argument("--batch", default=8, type=int, help="clips per step")
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--target", default=0.9, type=float)
    p.add_argument("--lr", default=1e-4, type=float,
                   help="keep at 1e-4 scale: the video head's output ReLU "
                        "kills channels at larger lrs")
    p.add_argument("--pretrained", default=None, type=str,
                   help="torch .pth.tar image checkpoint to warm-start the "
                        "tower from — the reference's own video recipe "
                        "(uniposeLSTM.py:274-281 defaults to UniPose_LSP.tar "
                        "and key-intersection-loads it).  MANDATORY at "
                        "368²/σ1: a cold start kills the whole ReLU head in "
                        "the first epoch even at lr 1e-4 (measured — "
                        "docs/BENCHMARKS.md round-5 video e2e)")
    p.add_argument("--sigma", default=None, type=float,
                   help="target Gaussian sigma override.  The Penn spec "
                        "default (the reference's video sigma=1, "
                        "uniposeLSTM.py:55) gives each joint ~0.5%% nonzero "
                        "pixels on the 46x46 stride-8 heatmap — measured to "
                        "kill the whole ReLU head within epoch 0 at 368², "
                        "warm or cold, even at lr 1e-4 (the reference's "
                        "as-shipped Penn loader cannot run at all, so its "
                        "sigma=1 recipe is untested upstream; the stride-8 "
                        "repair is ours and sigma=3 matches the image "
                        "pipeline's proven support fraction)")
    p.add_argument("--warmup-steps", default=0, type=int,
                   help="linear LR warmup (cli.train --warmup_steps).  "
                        "Measured NOT to rescue the 368² head-channel "
                        "death (loss pinned at the all-zero value through "
                        "the ramp); sigma is the knob that works")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--freeze-bn", action="store_true",
                   help="cli.train --freeze_bn: fine-tune with BN frozen to "
                        "the warm-start checkpoint's running stats")
    p.add_argument("--head-positive-bias", action="store_true",
                   help="cli.train --head_positive_bias (dead-channel-trap "
                        "mitigation)")
    p.add_argument("--size", default=368, type=int,
                   help="368 = the production resolution; smaller values "
                        "override the spec for CPU smoke runs")
    p.add_argument("--workdir", default="/tmp/cli_e2e_video")
    p.add_argument("--backend", default=None, choices=[None, "cpu"])
    p.add_argument("--devices", default=8, type=int)
    p.add_argument("--out", default=None, type=str)
    args = p.parse_args(argv)

    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(args.devices)

    root = os.path.join(args.workdir, "penn")
    write_penn_layout(
        root, "train", args.train_clips, args.train_nframes, args.size,
        seed=0, first_id=1,
    )
    write_penn_layout(
        root, "val", args.val_clips, args.frame_memory, args.size,
        seed=777, first_id=5001,
    )
    print(
        f"disk data: {args.train_clips} train clips x {args.train_nframes} "
        f"frames / {args.val_clips} val clips x {args.frame_memory} frames "
        f"at {args.size}px ({root})",
        flush=True,
    )

    # the exact user entry point, argv and all (uniposeLSTM.py:274-301's
    # counterpart: cli.train with --model_arch uniposeLSTM)
    from unipose_tpu.cli import train as cli_train
    from unipose_tpu.core.config import DATASETS
    from unipose_tpu.train.trainer import Trainer

    cli_argv = [
        "--dataset", "Penn_Action",
        "--model_arch", "uniposeLSTM",
        "--train_dir", root,
        "--val_dir", root,
        "--batch_size", str(args.batch),
        "--frame_memory", str(args.frame_memory),
        "--lr", str(args.lr),
        "--epochs", str(args.epochs),
        "--bf16",
        "--model_name", os.path.join(args.workdir, "uniposeLSTM_e2e"),
    ]
    if args.pretrained:
        cli_argv += ["--pretrained", args.pretrained]
    if args.sigma is not None:
        cli_argv += ["--sigma", str(args.sigma)]
    if args.warmup_steps:
        cli_argv += ["--warmup_steps", str(args.warmup_steps)]
    if args.seed:
        cli_argv += ["--seed", str(args.seed)]
    if args.freeze_bn:
        cli_argv += ["--freeze_bn"]
    if args.head_positive_bias:
        cli_argv += ["--head_positive_bias"]
    cli_args = cli_train.build_argparser().parse_args(cli_argv)
    model_config, train_config = cli_train.configs_from_args(cli_args)
    spec = None
    if args.size != 368:
        spec = dataclasses.replace(
            DATASETS["Penn_Action"], input_size=args.size
        )
    trainer = Trainer(
        model_config,
        train_config,
        train_dir=cli_args.train_dir,
        val_dir=cli_args.val_dir,
        pretrained=cli_args.pretrained,
        spec=spec,
    )
    print(
        f"train loader: {len(trainer.train_loader)} steps/epoch "
        f"(clip batch {trainer.train_loader.batch_size})",
        flush=True,
    )

    t0 = time.time()
    result = {
        "train_clips": args.train_clips, "frame_memory": args.frame_memory,
        "batch": args.batch, "lr": args.lr, "size": args.size,
        "target": args.target, "epochs_to_target": None,
    }
    for epoch in range(args.epochs):
        loss = trainer.training(epoch)
        trainer.validation(epoch)
        print(
            f"[epoch {epoch}] loss {loss:.5f} PCK@0.2 {trainer.best_pck:.4f} "
            f"PCKh {trainer.best_pckh:.4f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
        if trainer.best_pck >= args.target:
            result["epochs_to_target"] = epoch + 1
            break
    result.update(
        pck=round(float(trainer.best_pck), 4),
        pckh=round(float(trainer.best_pckh), 4),
        mAP=round(float(trainer.is_best), 4),
        steps=int(trainer.state.step),
        wall_s=round(time.time() - t0, 1),
        best_ckpt_saved=os.path.exists(
            os.path.join(args.workdir, "uniposeLSTM_e2e_best")
        ),
    )
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
