"""End-to-end video path: synthetic Penn Action data -> loaders -> video
Trainer (training + per-frame validation) on the CPU mesh, tiny size."""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.data.loader import PrefetchLoader
from unipose_tpu.data.penn_action import PennActionDataset

SIZE = 64
T = 2


def make_penn_root(tmp_path, split, n_clips=2, nframes=4):
    root = tmp_path / "penn"
    rng = np.random.RandomState(0)
    os.makedirs(root / split, exist_ok=True)
    for c in range(n_clips):
        clip = f"{c + 1:04d}"
        for f in range(nframes):
            os.makedirs(root / "frames" / clip, exist_ok=True)
            cv2.imwrite(
                str(root / "frames" / clip / f"{f + 1:06d}.jpg"),
                rng.randint(0, 255, (70, 90, 3), np.uint8),
            )
        data = {
            "nframes": nframes,
            "framepath": f"frames/{clip}",
            "dimensions": [70, 90],
            "x": rng.uniform(1, 89, (nframes, 13)),
            "y": rng.uniform(1, 69, (nframes, 13)),
            "visibility": rng.randint(0, 2, (nframes, 13)),
        }
        np.save(str(root / split / f"{clip}.npy"), data, allow_pickle=True)
    return str(root)


class _Resize64(PennActionDataset):
    """Penn dataset variant emitting SIZE-sized frames for the tiny model."""

    def __getitem__(self, index):
        s = super().__getitem__(index)
        frames = np.stack(
            [cv2.resize(f, (SIZE, SIZE)) for f in s["frames"]]
        ).astype(np.float32)
        kpts = s["kpts"].copy()
        kpts[..., :2] *= SIZE / 368.0
        centers = s["centers"] * (SIZE / 368.0)
        return {"frames": frames, "kpts": kpts, "centers": centers, "paths": s["paths"]}


@pytest.mark.slow
def test_trainer_test_demo_video(tmp_path):
    """Trainer.test on the LSTM variant: 1-frame rollout with zero LSTM state
    (Reference: uniposeLSTM.py:219-270) renders a skeleton + overlays."""
    from unipose_tpu.train.trainer import Trainer

    spec = dataclasses.replace(DATASETS["Penn_Action"], input_size=SIZE)
    trainer = Trainer(
        ModelConfig(
            dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=1
        ),
        TrainConfig(batch_size=1),
        spec=spec,
        loaders=(None, None),
    )
    img_path = str(tmp_path / "person.jpg")
    cv2.imwrite(
        img_path, np.random.RandomState(0).randint(0, 255, (90, 70, 3), np.uint8)
    )
    out_dir = tmp_path / "samples"
    kpts = trainer.test(img_path, out_dir=str(out_dir))
    assert len(kpts) == 13
    assert (out_dir / "pose.png").exists()
    assert len(list((out_dir / "heat").glob("*.png"))) > 0


@pytest.mark.slow
def test_video_trainer_end_to_end(tmp_path):
    from unipose_tpu.train.trainer import Trainer

    root = make_penn_root(tmp_path, "train")
    make_penn_root(tmp_path, "val")

    spec = dataclasses.replace(DATASETS["Penn_Action"], input_size=SIZE)
    train_ds = _Resize64(root, 1.0, T, True, rng=np.random.RandomState(0))
    val_ds = _Resize64(root, 1.0, T, False)
    loaders = (
        PrefetchLoader(train_ds, 1, shuffle=True, num_workers=2),
        PrefetchLoader(val_ds, 1, shuffle=False, num_workers=1, drop_last=False),
    )

    mc = ModelConfig(
        dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=T
    )
    tc = TrainConfig(
        batch_size=1, lr=1e-3, sigma=1.0,
        model_name=str(tmp_path / "uniposeLSTM"),  # keep best-ckpt out of cwd
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=1)

    loss = trainer.training(0)
    assert np.isfinite(loss)
    mAP = trainer.validation(0)
    assert 0.0 <= mAP <= 1.0


@pytest.mark.slow
def test_video_cli_e2e_disk_path(tmp_path):
    """Reduced in-suite version of scripts/cli_e2e_video_synthetic.py: the
    COMPOSED video user path — synthetic clips in the reference's on-disk
    Penn Action layout (penn_action_data.py:49-56) -> `cli.train` argparse
    -> production factory (batch_size->frame_memory quirk, real
    PennActionDataset with random train windows) -> GSPMD video trainer ->
    per-frame validation -> best-checkpoint save.  The accuracy leg (PCK
    target through this path) is the TPU run recorded in
    docs/BENCHMARKS.md; here one epoch pins the plumbing."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import cli_e2e_video_synthetic as e2e

    result = e2e.main([
        "--size", "64", "--train-clips", "8", "--val-clips", "4",
        "--train-nframes", "5", "--frame-memory", "3", "--batch", "8",
        "--epochs", "1", "--target", "0",
        "--workdir", str(tmp_path),
    ])
    assert result["epochs_to_target"] == 1
    assert result["steps"] == 1  # 8 clips / clip-batch 8, drop_last
    assert 0.0 <= result["pck"] <= 1.0
    assert result["best_ckpt_saved"]
