"""Parity harness self-check on TRAINED weights.

The CI tests of `cli/parity_run.py` use random reference weights; this
drives the SAME one-command harness through its strongest in-environment
exercise: our learning-validation checkpoint (held-out PCK 95%), exported
to a torch state_dict (compat/torch_export.py), loaded by the LIVE
reference model, and compared against our model on disk-backed synthetic
LSP-layout data — the full bidirectional loop (our training → reverse
converter → reference torch model → reference-shaped eval vs forward
converter → our model) with sharp, meaningful heatmaps rather than
random-init noise.  Expected and asserted: Δ ≈ 0.

Usage (CPU backend; torch runs in the harness's subprocess):
    python scripts/parity_trained_selfcheck.py \
        --ckpt /tmp/unipose_image_184.msgpack [--samples 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_synthetic_lsp_val(root: str, n: int, size: int = 368) -> str:
    """Write a synthetic pose val split in the on-disk LSP layout the
    production loader parses: images/im%04d.jpg + joints.mat ('lsp'
    (3, 14, N) with INVERTED visibility)."""
    import cv2
    import numpy as np
    import scipy.io

    from unipose_tpu.data.synthetic import SyntheticPoseLoader

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    loader = SyntheticPoseLoader(
        num_samples=n, batch_size=n, input_size=size, seed=777, fixed=True
    )
    batch = next(iter(loader))
    joints = np.zeros((3, 14, n))
    for i in range(n):
        cv2.imwrite(
            os.path.join(root, "images", f"im{i + 1:04d}.jpg"),
            batch["image"][i].astype(np.uint8),
        )
        joints[0, :, i] = batch["kpts"][i, :, 0]
        joints[1, :, i] = batch["kpts"][i, :, 1]
        joints[2, :, i] = 0.0  # lsp layout: 0 = visible (inverted)
    scipy.io.savemat(os.path.join(root, "joints.mat"), {"joints": joints})
    return root


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/unipose_image_184.msgpack")
    p.add_argument("--samples", default=8, type=int)
    p.add_argument("--workdir", default="/tmp/parity_selfcheck")
    args = p.parse_args(argv)

    from unipose_tpu.utils.platform import force_cpu_platform

    force_cpu_platform(1)  # torch loads in this process too (the exporter)

    import torch
    from flax import serialization

    from unipose_tpu.compat.torch_export import export_state_dict

    src = serialization.msgpack_restore(open(args.ckpt, "rb").read())
    sd = export_state_dict(
        {"params": src["params"], "batch_stats": src["batch_stats"]},
        variant="image",
    )
    ckpt_path = os.path.join(args.workdir, "trained_image.pth.tar")
    os.makedirs(args.workdir, exist_ok=True)
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
        ckpt_path,
    )
    print(f"exported {len(sd)} trained arrays -> {ckpt_path}")

    val_dir = make_synthetic_lsp_val(
        os.path.join(args.workdir, "lsp_val"), args.samples
    )

    from unipose_tpu.cli.parity_run import main as parity_main

    verdict = parity_main([
        "--torch_ckpt", ckpt_path,
        "--val_dir", val_dir,
        "--dataset", "LSP",
        "--max_samples", str(args.samples),
        "--out", os.path.join(args.workdir, "verdict.json"),
    ])
    assert verdict["pass"], verdict
    print("TRAINED-WEIGHTS PARITY SELF-CHECK PASS")
    return verdict


if __name__ == "__main__":
    main()
