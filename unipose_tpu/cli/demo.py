"""Demo inference CLI: single image -> skeleton render + per-channel heatmap
overlays (Reference: unipose.py:197-246 ``Trainer.test``)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="unipose_tpu demo inference")
    p.add_argument("image", type=str, help="input image path")
    p.add_argument("--dataset", type=str, default="LSP")
    p.add_argument("--pretrained", default=None, type=str)
    p.add_argument("--out_dir", default="samples", type=str)
    args = p.parse_args(argv)

    import cv2
    import jax
    import numpy as np

    from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
    from unipose_tpu.train.state import create_train_state
    from unipose_tpu.train.checkpoint import warm_start_from_torch
    from unipose_tpu.train.steps import preprocess_images
    from unipose_tpu.viz.draw import draw_paint, get_kpts, heatmap_overlays
    from unipose_tpu.ops.resize import bilinear_resize

    spec = DATASETS[args.dataset]
    mc = ModelConfig(dataset=args.dataset, num_classes=spec.num_joints)
    model, tx, state = create_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    if args.pretrained:
        state = warm_start_from_torch(state, args.pretrained)

    img = np.asarray(
        cv2.resize(cv2.imread(args.image), (368, 368)), np.float32
    )
    x = preprocess_images(img[None])

    @jax.jit
    def forward(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        # 46 -> 368 align-corners upsample (unipose.py:223)
        return bilinear_resize(out, x.shape[1:3])

    heat = np.asarray(forward(state.params, state.batch_stats, x))
    kpts = get_kpts(heat, img_h=368.0, img_w=368.0)
    os.makedirs(args.out_dir, exist_ok=True)
    draw_paint(
        args.image, kpts, args.dataset,
        out_path=os.path.join(args.out_dir, "pose.png"),
    )
    heatmap_overlays(heat, args.image, out_dir=os.path.join(args.out_dir, "heat"))
    print(f"wrote {args.out_dir}/pose.png and {args.out_dir}/heat/*.png")
    print("keypoints:", kpts)


if __name__ == "__main__":
    main()
