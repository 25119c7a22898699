"""Training CLI — the L4 entry point.

Usage (image, Reference: unipose.py:248-275):
    python -m unipose_tpu.cli.train --dataset LSP --train_dir ... --val_dir ...
Usage (video, Reference: uniposeLSTM.py:274-301):
    python -m unipose_tpu.cli.train --dataset Penn_Action --model_arch uniposeLSTM ...

Unlike the reference, flags are not silently overridden after parsing
(unipose.py:261-267 hardcodes paths over the CLI values); presets from
``unipose_tpu.core.config`` supply defaults instead.
"""

from __future__ import annotations

import argparse

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="unipose_tpu trainer")
    p.add_argument("--pretrained", default=None, type=str,
                   help="torch .pth.tar or orbax dir to warm-start from")
    p.add_argument("--dataset", type=str, default="LSP",
                   choices=sorted(DATASETS))
    p.add_argument("--train_dir", default=None, type=str)
    p.add_argument("--val_dir", default=None, type=str)
    p.add_argument("--model_name", default="unipose", type=str)
    p.add_argument("--model_arch", default="unipose", type=str,
                   choices=["unipose", "uniposeLSTM"])
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--frame_memory", default=5, type=int)
    p.add_argument("--sigma", default=None, type=float,
                   help="target Gaussian sigma (default: the reference's "
                        "3.0 image / 1.0 video)")
    p.add_argument("--stride", default=None, type=int,
                   help="heatmap stride override (default: dataset spec's 8)")
    p.add_argument("--warmup_steps", default=0, type=int,
                   help="linear LR warmup steps (0 = off, the reference "
                        "schedule; measured to NOT rescue — and can worsen "
                        "— the video head's dead-channel trap, see "
                        "TrainConfig.warmup_steps / docs/BENCHMARKS.md)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--head_positive_bias", action="store_true",
                   help="video: init the 11x11 head's biases at the positive "
                        "torch bound so every output-ReLU channel starts "
                        "alive (dead-channel-trap mitigation, "
                        "ModelConfig.head_positive_bias)")
    p.add_argument("--freeze_bn", action="store_true",
                   help="fine-tune with BatchNorm frozen to running stats "
                        "(the reference flag, made functional)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--config", default=None, type=str,
                   help="YAML config (see core.config.load_yaml_config); "
                        "overrides the other model/train flags")
    p.add_argument("--checkpoint_dir", default=None, type=str,
                   help="periodic-checkpoint/auto-resume directory")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler device trace of epoch 0 "
                        "(view in TensorBoard/Perfetto)")
    p.add_argument("--time_parallel", default=1, type=int,
                   help="video only: shard each clip's frames over a 'time' "
                        "mesh axis of this size (sequence/context parallelism, "
                        "parallel/cp.py); remaining devices form the 'data' "
                        "axis. 1 = off")
    return p


def apply_time_parallel(model_config, train_config, n_time: int):
    """Resolve ``--time_parallel`` into configs: a (data, time) mesh plus the
    model's ``spmd_axes`` (frames of one clip shard across chips for the
    tower + head; the tiny ConvLSTM scan runs replicated — parallel/cp.py)."""
    import dataclasses

    if n_time <= 1:
        return model_config, train_config
    if model_config.variant != "lstm":
        raise SystemExit("--time_parallel applies to --model_arch uniposeLSTM only")
    import jax

    n_dev = jax.device_count()
    if n_dev % n_time != 0:
        raise SystemExit(
            f"--time_parallel {n_time} does not divide the device count "
            f"{n_dev}: a (-1, {n_time}) mesh would strand "
            f"{n_dev % n_time} chip(s)"
        )
    if model_config.frame_memory % n_time != 0:
        raise SystemExit(
            f"--time_parallel {n_time} does not divide --frame_memory "
            f"{model_config.frame_memory}: frames of one clip cannot shard "
            "evenly over the 'time' axis"
        )
    return (
        dataclasses.replace(model_config, spmd_axes=("data", "time")),
        dataclasses.replace(
            train_config, mesh_shape=(-1, n_time), mesh_axes=("data", "time")
        ),
    )


def configs_from_args(args) -> tuple:
    import jax.numpy as jnp

    spec = DATASETS[args.dataset]
    video = args.model_arch == "uniposeLSTM"
    model_config = ModelConfig(
        dataset=args.dataset,
        num_classes=spec.num_joints,
        variant="lstm" if video else "image",
        frame_memory=args.frame_memory,
        freeze_bn=getattr(args, "freeze_bn", False),
        head_positive_bias=getattr(args, "head_positive_bias", False),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    # reference defaults: batch 8 image (unipose.py:49), clip-batch 1 video
    # (uniposeLSTM.py:51); sigma 3 image / 1 video (unipose.py:53,
    # uniposeLSTM.py:55)
    batch = args.batch_size or (1 if video else 8)
    train_config = TrainConfig(
        batch_size=batch,
        lr=args.lr,
        sigma=args.sigma if args.sigma is not None else (1.0 if video else 3.0),
        stride=args.stride,
        epochs=args.epochs,
        seed=args.seed,
        model_name=args.model_name,
        warmup_steps=getattr(args, "warmup_steps", 0),
    )
    return model_config, train_config


def main(argv=None):
    import dataclasses

    args = build_argparser().parse_args(argv)

    # Multi-host bring-up must precede any backend touch (mesh.py docstring);
    # no-op unless a launcher set a coordinator address.
    from unipose_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()

    if args.config:
        from unipose_tpu.core.config import load_yaml_config

        preset = load_yaml_config(args.config)
        model_config, train_config = preset.model, preset.train
    else:
        model_config, train_config = configs_from_args(args)
    if args.checkpoint_dir:
        train_config = dataclasses.replace(
            train_config, checkpoint_dir=args.checkpoint_dir
        )
    model_config, train_config = apply_time_parallel(
        model_config, train_config, args.time_parallel
    )

    from unipose_tpu.train.trainer import Trainer

    trainer = Trainer(
        model_config,
        train_config,
        train_dir=args.train_dir,
        val_dir=args.val_dir,
        pretrained=args.pretrained,
    )
    try:
        for epoch in range(train_config.epochs):
            if trainer.train_loader is not None:
                if epoch == 0 and args.profile_dir:
                    from unipose_tpu.utils.profiling import trace

                    with trace(args.profile_dir):
                        trainer.training(epoch)
                else:
                    trainer.training(epoch)
            if trainer.val_loader is not None:
                trainer.validation(epoch)
    finally:
        trainer.finalize()  # commit any in-flight async checkpoint


if __name__ == "__main__":
    main()
