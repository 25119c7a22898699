"""End-to-end eval-epoch host pipeline: Python loader vs the C++ decode core.

Round-2 left the native decode core as a per-core microbenchmark
(149 vs 40 samples/s/core, docs/BENCHMARKS.md); round 3 wires it into the
factory's eval splits (data/loader.py use_native).  This measures the number
that matters for a real epoch: batches/sec out of each loader at full 368
resolution over an on-disk JPEG dataset, i.e. the host side that must keep up
with the device val step (scripts/profile_val.py: 834 f/s on v5e).

The device step is measured separately because this environment's TPU tunnel
moves host->device data at ~MB/s (CLAUDE.md) — a real TPU host overlaps a
>GB/s transfer with compute, so end-to-end epoch throughput there is
min(host pipeline, device step).

Usage: python scripts/profile_epoch.py [--n 256] [--batch 32] [--size 368]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_lsp_root(root: str, n: int, h: int = 480, w: int = 640,
                  mode: str = "lsp") -> str:
    import cv2
    import scipy.io

    img_dir = os.path.join(root, "images")
    done_marker = os.path.join(root, f".done_{n}_{h}x{w}")
    if os.path.exists(done_marker):
        return root
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        cv2.imwrite(
            os.path.join(img_dir, f"im{i + 1:05d}.jpg"),
            rng.randint(0, 255, (h, w, 3), np.uint8),
        )
    if mode == "lspet":  # (14, 3, N) layout, straight visibility
        joints = np.zeros((14, 3, n))
        joints[:, 0, :] = rng.uniform(5, w - 5, (14, n))
        joints[:, 1, :] = rng.uniform(5, h - 5, (14, n))
        joints[:, 2, :] = rng.randint(0, 2, (14, n))
    else:  # lsp (3, 14, N), inverted visibility
        joints = np.zeros((3, 14, n))
        joints[0] = rng.uniform(5, w - 5, (14, n))
        joints[1] = rng.uniform(5, h - 5, (14, n))
        joints[2] = rng.randint(0, 2, (14, n))
    scipy.io.savemat(os.path.join(root, "joints.mat"), {"joints": joints})
    open(done_marker, "w").close()
    return root


def drain(loader) -> float:
    """Iterate one epoch; return seconds.  A checksum touch per batch keeps
    lazily-materialized arrays honest."""
    t0 = time.perf_counter()
    sink = 0.0
    for batch in loader:
        sink += float(batch["image"].ravel()[::100000].sum())
    assert np.isfinite(sink)
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--root", default="/tmp/unipose_epoch_lsp")
    p.add_argument("--split", default="val", choices=["val", "train"],
                   help="train = the round-4 native TRAIN path "
                        "(decode + vectorized flip + epoch shuffle)")
    args = p.parse_args()

    from unipose_tpu.data.loader import get_dataloader

    train = args.split == "train"
    root = make_lsp_root(
        args.root + ("_train" if train else ""), args.n,
        mode="lspet" if train else "lsp",
    )

    results = {}
    for label, use_native in (("python", False), ("native", True)):
        loaders = get_dataloader(
            "LSP",
            root if train else None,
            None if train else root,
            3.0, 8, workers=args.workers,
            batch_size=args.batch, val_batch_size=args.batch,
            use_native=use_native,
        )
        val = loaders[0] if train else loaders[1]
        drain(val)  # warm page cache so both runs read hot files
        dt = min(drain(val) for _ in range(2))
        results[label] = args.n / dt
        print(f"{label:>7} loader: {args.n} images in {dt:.3f}s "
              f"-> {args.n / dt:.1f} images/s ({os.cpu_count()} host cores)")
    print(f"native/python: {results['native'] / results['python']:.2f}x")


if __name__ == "__main__":
    main()
