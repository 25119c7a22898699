"""Learning validation: train UniPose on synthetic pose data until held-out
PCK@0.2 crosses a threshold (VERDICT r3 next-round #1).

Everything piecewise is oracle-pinned elsewhere; this run is the proof that
the COMPOSED system — loaders, device-side targets, LR schedule, BN
EMA + donation, dropout keys, loss, eval argmax — actually learns to
localize.  The reference's analogous evidence is its training recipe
producing paper numbers (Reference: unipose.py:100-193); real data being
unfetchable here, the synthetic set (data/synthetic.py) stands in.

Usage (TPU, image variant, ~minutes):
    python scripts/train_synthetic.py --variant image --size 184 --batch 32
Usage (CPU mesh, tiny smoke):
    python scripts/train_synthetic.py --backend cpu --devices 8 \
        --size 64 --batch 8 --train-samples 64 --val-samples 16 --epochs 8

Prints one JSON line at the end:
    {"variant": ..., "epochs_to_target": N, "pck": ..., "mAP": ...,
     "steps": ..., "wall_s": ..., "int8_pck": ...?}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", default="image", choices=["image", "lstm"])
    p.add_argument("--dataset", default="LSP",
                   choices=["LSP", "MPII", "BBC", "Penn_Action"],
                   help="skeleton / joint order / metric family "
                        "(data/synthetic.py SKELETONS)")
    p.add_argument("--target-metric", default="pck", choices=["pck", "pckh"],
                   help="which held-out metric gates early stop.  MPII "
                        "should use pckh: its PCK 'torso' is the "
                        "reference's scalar-x quirk |pelvis_x - thorax_x| "
                        "(evaluate.py:156), near zero on upright figures")
    p.add_argument("--size", default=184, type=int,
                   help="input resolution (stride-8 heatmaps)")
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--val-batch", default=None, type=int)
    p.add_argument("--train-samples", default=512, type=int,
                   help="samples (image) or clips (lstm) per epoch")
    p.add_argument("--val-samples", default=64, type=int)
    p.add_argument("--frame-memory", default=5, type=int)
    p.add_argument("--epochs", default=40, type=int)
    p.add_argument("--target", default=0.95, type=float,
                   help="held-out PCK@0.2 threshold to stop at")
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--sigma", default=None, type=float,
                   help="target Gaussian sigma override (default: spec's 3.0; "
                        "heatmaps at reduced input sizes are relatively "
                        "coarser, so a sharper sigma can be appropriate)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--head-positive-bias", action="store_true",
                   help="lstm: ModelConfig.head_positive_bias (dead-channel-"
                        "trap mitigation, docs/BENCHMARKS.md round-5)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--int8-study", action="store_true",
                   help="after training, evaluate the w8a8 int8 front end's "
                        "PCK on the same held-out set (image variant)")
    p.add_argument("--time-parallel", default=1, type=int,
                   help="lstm only: CP mesh (-1, n) — the learning run under "
                        "sequence parallelism")
    p.add_argument("--backend", default=None, choices=[None, "cpu"],
                   help="cpu = virtual device mesh (tests); default = real")
    p.add_argument("--devices", default=8, type=int,
                   help="virtual device count with --backend cpu")
    p.add_argument("--out", default=None, type=str,
                   help="write the JSON result line to this file too")
    p.add_argument("--save-ckpt", default=None, type=str,
                   help="serialize trained (params, batch_stats) to this "
                        "msgpack file")
    p.add_argument("--init-from", default=None, type=str,
                   help="warm-start matching modules (backbone/wasp/decoder) "
                        "from a --save-ckpt file — the reference's video "
                        "recipe trains UniPose-LSTM FROM a trained image "
                        "checkpoint (uniposeLSTM.py --pretrained)")
    return p


def _save_ckpt(path, state):
    import jax
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}
        ))


def _init_from(path, state):
    """Copy every leaf whose path+shape matches (key-intersection warm start,
    the reference's partial-load semantics, unipose.py:79-90)."""
    import jax
    import numpy as np

    from flax import serialization

    with open(path, "rb") as f:
        src = serialization.msgpack_restore(f.read())

    copied = [0]

    def merge(dst, sub):
        if not isinstance(dst, dict):
            return dst
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, sub.get(k, {}) if isinstance(sub, dict) else {})
            elif (
                isinstance(sub, dict)
                and k in sub
                and getattr(sub[k], "shape", None) == tuple(v.shape)
            ):
                out[k] = jnp_asarray(sub[k], v.dtype)
                copied[0] += 1
            else:
                out[k] = v
        return out

    import jax.numpy as jnp

    def jnp_asarray(x, dtype):
        return jnp.asarray(np.asarray(x), dtype)

    new_params = merge(
        jax.tree_util.tree_map(lambda x: x, state.params), src.get("params", {})
    )
    new_stats = merge(
        jax.tree_util.tree_map(lambda x: x, state.batch_stats),
        src.get("batch_stats", {}),
    )
    print(f"warm start: {copied[0]} arrays copied from {path}")
    return state.replace(params=new_params, batch_stats=new_stats)


def eval_pck(forward, loader, spec, dataset="LSP", video=False):
    """Held-out PCK/PCKh/mAP with the production metric semantics
    (per-frame accuracy_from_coords + visibility-gated running means,
    exactly Trainer.validation's accumulation)."""
    import numpy as np

    from unipose_tpu.eval.metrics import accuracy_from_coords, get_max_preds
    from unipose_tpu.train.steps import make_targets, preprocess_images

    hm = spec.heatmap_size
    k = spec.num_joints
    AP = np.zeros(k + 1)
    PCK = np.zeros(k + 1)
    PCKh = np.zeros(k + 1)
    count = np.zeros(k + 1)
    import jax.numpy as jnp

    frames = []
    nchw = lambda a: np.moveaxis(np.asarray(a), -1, 0)  # noqa: E731
    for batch in loader:
        if video:
            out = forward(batch)  # (B, T, h, w, K+1) channel-last
            tgt_hm = np.asarray(make_targets(jnp.asarray(batch["kpts"]), spec))
            b, t = out.shape[:2]
            for i in range(b):
                for j in range(t):
                    p, _ = get_max_preds(nchw(out[i, j])[None])
                    g, _ = get_max_preds(nchw(tgt_hm[i, j])[None])
                    frames.append((p[0], g[0]))
        else:
            out = forward(batch)  # (B, h, w, K+1) channel-last
            tgt_hm = np.asarray(make_targets(jnp.asarray(batch["kpts"]), spec))
            for i in range(out.shape[0]):
                p, _ = get_max_preds(nchw(out[i])[None])
                g, _ = get_max_preds(nchw(tgt_hm[i])[None])
                frames.append((p[0], g[0]))
    for idx, (p, g) in enumerate(frames):
        acc, acc_pck, acc_pckh, _, _, visible = accuracy_from_coords(
            p[None], g[None], hm, hm, 0.2, 0.5, dataset
        )
        AP[0] = (AP[0] * idx + acc[0]) / (idx + 1)
        PCK[0] = (PCK[0] * idx + acc_pck[0]) / (idx + 1)
        PCKh[0] = (PCKh[0] * idx + acc_pckh[0]) / (idx + 1)
        for j in range(1, k + 1):
            if visible[j] == 1:
                AP[j] = (AP[j] * count[j] + acc[j]) / (count[j] + 1)
                PCK[j] = (PCK[j] * count[j] + acc_pck[j]) / (count[j] + 1)
                PCKh[j] = (PCKh[j] * count[j] + acc_pckh[j]) / (count[j] + 1)
                count[j] += 1
    return {
        "mAP": AP[1:].sum() / k,
        "mPCK": PCK[1:].sum() / k,
        "mPCKh": PCKh[1:].sum() / k,
    }


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(args.devices)

    import jax.numpy as jnp

    from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
    from unipose_tpu.data.synthetic import make_loaders
    from unipose_tpu.train.trainer import Trainer

    video = args.variant == "lstm"
    spec = dataclasses.replace(DATASETS[args.dataset], input_size=args.size)
    model_config = ModelConfig(
        dataset=args.dataset,
        num_classes=spec.num_joints,
        variant="lstm" if video else "image",
        frame_memory=args.frame_memory,
        head_positive_bias=args.head_positive_bias,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    mesh_shape, mesh_axes = (-1,), ("data",)
    if args.time_parallel > 1:
        if not video:
            raise SystemExit("--time-parallel needs --variant lstm")
        model_config = dataclasses.replace(
            model_config, spmd_axes=("data", "time")
        )
        mesh_shape, mesh_axes = (-1, args.time_parallel), ("data", "time")
    train_config = TrainConfig(
        batch_size=args.batch,
        lr=args.lr,
        sigma=args.sigma,
        epochs=args.epochs,
        seed=args.seed,
        model_name="",  # no best-checkpoint writes
        mesh_shape=mesh_shape,
        mesh_axes=mesh_axes,
        val_batch_size=args.val_batch or args.batch,
    )
    loaders = make_loaders(
        args.variant,
        input_size=args.size,
        train_samples=args.train_samples,
        val_samples=args.val_samples,
        batch_size=args.batch,
        val_batch_size=args.val_batch or args.batch,
        frame_memory=args.frame_memory,
        seed=args.seed,
        dataset=args.dataset,
    )
    trainer = Trainer(model_config, train_config, spec=spec, loaders=loaders)
    if args.init_from:
        trainer.state = _init_from(args.init_from, trainer.state)

    t0 = time.time()
    result = {"variant": args.variant, "dataset": args.dataset,
              "size": args.size, "batch": args.batch, "target": args.target,
              "target_metric": args.target_metric, "epochs_to_target": None}
    gate = (lambda: trainer.best_pckh) if args.target_metric == "pckh" else (
        lambda: trainer.best_pck
    )
    mAP = 0.0
    for epoch in range(args.epochs):
        loss = trainer.training(epoch)
        mAP = trainer.validation(epoch)
        print(
            f"[epoch {epoch}] loss {loss:.5f} mAP {mAP:.4f} "
            f"PCK@0.2 {trainer.best_pck:.4f} PCKh {trainer.best_pckh:.4f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if gate() >= args.target and result["epochs_to_target"] is None:
            result["epochs_to_target"] = epoch + 1
            break
    result.update(
        pck=round(float(trainer.best_pck), 4),
        pckh=round(float(trainer.best_pckh), 4),
        mAP=round(float(mAP), 4),
        steps=int(trainer.state.step),
        wall_s=round(time.time() - t0, 1),
    )

    if args.int8_study and not video:
        # Int8 accuracy at the TASK level on trained weights (VERDICT r3
        # next-round #2): same held-out set, same metric path, bf16 tower
        # with the w8a8 front end vs the trained f32/bf16 model.
        import jax

        from unipose_tpu.models.quantized import int8_forward_fn
        from unipose_tpu.train.steps import preprocess_images

        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        calib = next(iter(loaders[1]))
        calib_x = preprocess_images(jnp.asarray(calib["image"]))
        _, fwd_int8 = int8_forward_fn(
            variables, calib_x, num_classes=model_config.num_classes
        )

        @jax.jit
        def fwd_ref(x):
            return trainer.model.apply(variables, x, train=False)

        def fw_base(batch):
            return fwd_ref(preprocess_images(jnp.asarray(batch["image"])))

        def fw_q(batch):
            return fwd_int8(preprocess_images(jnp.asarray(batch["image"])))

        base = eval_pck(fw_base, loaders[1], trainer.spec, dataset=args.dataset)
        quant = eval_pck(fw_q, loaders[1], trainer.spec, dataset=args.dataset)
        result["base_pck"] = round(float(base["mPCK"]), 4)
        result["int8_pck"] = round(float(quant["mPCK"]), 4)
        result["int8_pck_delta"] = round(
            float(quant["mPCK"] - base["mPCK"]), 4
        )

    if args.save_ckpt:
        import jax

        _save_ckpt(args.save_ckpt, trainer.state)
        print(f"checkpoint saved to {args.save_ckpt}")

    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
