"""Export a serving artifact (StableHLO via ``jax.export``) to a file.

The reference has no deployment story (SURVEY §1 "no serving layer"); this
is the missing piece between training and ``cli/serve.py``: bake weights —
fresh, torch-warm-started, or restored from an orbax checkpoint — into a
self-contained artifact any JAX runtime can load without the model code.

Usage:
  python -m unipose_tpu.cli.export --dataset LSP --out model.hlo \
      [--pretrained w.pth.tar | --checkpoint_dir ckpts/] [--size 368]
  python -m unipose_tpu.cli.export --dataset Penn_Action \
      --model_arch uniposeLSTM --frame_memory 5 --out video.hlo
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="unipose_tpu artifact export")
    p.add_argument("--dataset", type=str, default="LSP")
    p.add_argument("--out", required=True, type=str, help="output artifact path")
    p.add_argument("--pretrained", default=None, type=str,
                   help="torch .pth.tar to warm-start from")
    p.add_argument("--checkpoint_dir", default=None, type=str,
                   help="orbax checkpoint dir to restore the latest step from")
    p.add_argument("--model_arch", default="unipose", type=str,
                   choices=["unipose", "uniposeLSTM"])
    p.add_argument("--frame_memory", default=5, type=int)
    p.add_argument("--batch", default=1, type=int, help="baked batch size")
    p.add_argument("--size", default=368, type=int, help="baked input size")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--raw_uint8",
        action="store_true",
        help="artifact takes raw uint8 pixels and normalizes on device — "
        "4x less host->device transfer per request; cli/serve auto-detects "
        "the input dtype",
    )
    p.add_argument(
        "--int8_frontend",
        action="store_true",
        help="quantize the bandwidth-bound ResNet front end to w8a8 "
        "(changes numerics; measured +8%% throughput on image artifacts, "
        "parity on video; task-level cost on trained weights: -0.11pt "
        "PCK@0.2 on the learning-validation checkpoint — see "
        "docs/BENCHMARKS.md int8 study)",
    )
    p.add_argument(
        "--stream",
        action="store_true",
        help="video only: export a STREAMING artifact (a chunk-program pair "
        "carrying ConvLSTM state), so cli/serve can run clips of any length "
        "in fixed --frame_memory chunks",
    )
    args = p.parse_args(argv)
    if args.stream and args.int8_frontend:
        raise SystemExit("--stream with --int8_frontend is not supported "
                         "(int8 measured at parity on video anyway)")

    import jax

    from unipose_tpu.compat.export import export_inference
    from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
    from unipose_tpu.train.state import create_train_state

    import jax.numpy as jnp

    spec = DATASETS[args.dataset]
    video = args.model_arch == "uniposeLSTM"
    mc = ModelConfig(
        dataset=args.dataset,
        num_classes=spec.num_joints,
        variant="lstm" if video else "image",
        frame_memory=args.frame_memory,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    model, _, state = create_train_state(
        mc, TrainConfig(), jax.random.PRNGKey(0), input_size=args.size
    )
    if args.pretrained:
        from unipose_tpu.train.checkpoint import warm_start_from_torch

        state = warm_start_from_torch(
            state, args.pretrained, variant="lstm" if video else "image"
        )
    if args.checkpoint_dir:
        from unipose_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
        state = restored
        print(f"restored step {int(state.step)} from {args.checkpoint_dir}")

    shape = (
        (args.batch, args.frame_memory, args.size, args.size, 3)
        if video
        else (args.batch, args.size, args.size, 3)
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    forward = None
    if args.int8_frontend:
        from unipose_tpu.models.quantized import int8_forward_fn, int8_video_forward_fn

        # Calibrate activation scales on synthetic images in the serving
        # input range ((x - 128) / 256 of uniform [0, 255]); for deployment-
        # grade scales, re-export with a representative batch.
        calib_shape = (
            (2, args.frame_memory, args.size, args.size, 3)
            if video
            else (8, args.size, args.size, 3)
        )
        calib = (
            jax.random.uniform(jax.random.PRNGKey(0), calib_shape) * 255.0 - 128.0
        ) / 256.0
        kw = dict(
            num_classes=spec.num_joints,
            wasp_double_conv2=mc.wasp_double_conv2,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        if video:
            _, forward = int8_video_forward_fn(variables, calib, **kw)
        else:
            _, forward = int8_forward_fn(variables, calib, **kw)
    if args.stream:
        if not video:
            raise SystemExit("--stream requires --model_arch uniposeLSTM")
        from unipose_tpu.compat.export import export_video_stream

        blob = export_video_stream(
            model, variables, shape, path=args.out, raw_uint8=args.raw_uint8
        )
        print(
            f"wrote {args.out}: {len(blob)} bytes, streaming chunk "
            f"{list(shape)}"
        )
        return
    blob = export_inference(
        model,
        variables,
        shape,
        path=args.out,
        video=video,
        forward=forward,
        raw_uint8=args.raw_uint8,
    )
    print(f"wrote {args.out}: {len(blob)} bytes, input {list(shape)}")


if __name__ == "__main__":
    main()
