"""Eval-only CLI: restore a checkpoint and run validation with the per-joint
PCK/PCKh/AP report (Reference: unipose.py validation loop, :133-193)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="unipose_tpu evaluation")
    p.add_argument("--dataset", type=str, default="LSP")
    p.add_argument("--val_dir", required=True, type=str)
    p.add_argument("--pretrained", default=None, type=str,
                   help="torch .pth.tar warm start")
    p.add_argument("--checkpoint_dir", default=None, type=str,
                   help="orbax checkpoint dir to restore")
    p.add_argument("--model_arch", default="unipose", type=str,
                   choices=["unipose", "uniposeLSTM"])
    p.add_argument("--frame_memory", default=5, type=int)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    # Fail fast and clearly before any model build: this is the entry point
    # of the pretrained-weight PCK parity runbook (docs/ROADMAP.md), whose
    # checkpoint artifacts are fetched out-of-band.
    if args.pretrained is not None:
        import os

        if not os.path.exists(args.pretrained):
            raise SystemExit(
                f"--pretrained checkpoint not found: {args.pretrained!r}.\n"
                "Fetch a released UniPose checkpoint (Google Drive links in "
                "the reference README) or point at your own *.pth.tar, then "
                "rerun — see docs/ROADMAP.md 'Pretrained-weight parity "
                "runbook' for the full command sequence."
            )

    from unipose_tpu.cli.train import configs_from_args
    from unipose_tpu.train.trainer import Trainer

    ns = argparse.Namespace(
        dataset=args.dataset,
        model_arch=args.model_arch,
        frame_memory=args.frame_memory,
        bf16=args.bf16,
        batch_size=None,
        lr=1e-4,
        sigma=None,
        stride=None,
        epochs=1,
        seed=0,
        model_name=None,
    )
    model_config, train_config = configs_from_args(ns)
    if args.checkpoint_dir:
        import dataclasses

        train_config = dataclasses.replace(
            train_config, checkpoint_dir=args.checkpoint_dir
        )
    trainer = Trainer(
        model_config,
        train_config,
        val_dir=args.val_dir,
        pretrained=args.pretrained,
    )
    trainer.validation(0)


if __name__ == "__main__":
    main()
