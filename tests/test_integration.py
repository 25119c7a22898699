"""End-to-end integration: synthetic LSP data on disk -> loaders ->
Trainer.training + Trainer.validation on the CPU mesh (tiny input size)."""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import scipy.io  # noqa: E402

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.data import transforms as T
from unipose_tpu.data.loader import PrefetchLoader
from unipose_tpu.data.lsp import LSPDataset

SIZE = 64


def make_lsp_root(tmp_path, name, mode, n):
    root = tmp_path / name
    rng = np.random.RandomState(0)
    for i in range(n):
        os.makedirs(root / "images", exist_ok=True)
        cv2.imwrite(
            str(root / "images" / f"im{i + 1:04d}.jpg"),
            rng.randint(0, 255, (80, 90, 3), np.uint8),
        )
    if mode == "lsp":
        joints = np.zeros((3, 14, n))
        joints[0] = rng.uniform(5, 85, (14, n))
        joints[1] = rng.uniform(5, 75, (14, n))
        joints[2] = rng.randint(0, 2, (14, n))
    else:
        joints = np.zeros((14, 3, n))
        joints[:, 0, :] = rng.uniform(5, 85, (14, n))
        joints[:, 1, :] = rng.uniform(5, 75, (14, n))
        joints[:, 2, :] = rng.randint(0, 2, (14, n))
    scipy.io.savemat(str(root / "joints.mat"), {"joints": joints})
    return str(root)


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    from unipose_tpu.train.trainer import Trainer

    train_root = make_lsp_root(tmp_path, "lspet", "lspet", 4)
    val_root = make_lsp_root(tmp_path, "lsp", "lsp", 2)

    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    train_ds = LSPDataset(
        "lspet", train_root, 3.0, 8,
        T.Compose([T.RandomHorizontalFlip()]), input_size=SIZE,
    )
    val_ds = LSPDataset(
        "lsp", val_root, 3.0, 8, T.Compose([]), input_size=SIZE
    )
    loaders = (
        PrefetchLoader(train_ds, 2, shuffle=True, num_workers=2),
        PrefetchLoader(val_ds, 1, shuffle=False, num_workers=1, drop_last=False),
        None,
    )

    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(
        batch_size=2, lr=1e-3, checkpoint_dir=str(tmp_path / "ckpt"),
        model_name=str(tmp_path / "unipose"),  # keep best-ckpt out of cwd
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=1)

    loss = trainer.training(0)
    assert np.isfinite(loss)
    assert int(trainer.state.step) == 2  # 4 samples / batch 2

    mAP = trainer.validation(0)
    assert 0.0 <= mAP <= 1.0

    # periodic checkpoint written; a fresh trainer resumes from it
    assert os.path.isdir(tmp_path / "ckpt")
    trainer2 = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=1)
    assert int(trainer2.state.step) == 2


@pytest.mark.slow
def test_trainer_validation_native_loader(tmp_path):
    """A full val epoch through the C++ decode loader (round-3 wiring of the
    native core into production eval): Trainer.validation consumes native
    batches — including the padded ragged tail — and produces the same mAP
    as the Python loader path."""
    from unipose_tpu import native

    if not native.available():
        pytest.skip("native decode core unavailable")
    from unipose_tpu.data.native_loader import native_lsp_val_loader
    from unipose_tpu.train.trainer import Trainer

    val_root = make_lsp_root(tmp_path, "lsp_nat", "lsp", 3)
    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    val_ds = LSPDataset("lsp", val_root, 3.0, 8, T.Compose([]), input_size=SIZE)
    nat = native_lsp_val_loader(val_ds, 2)  # 3 samples: full batch + ragged tail
    py = PrefetchLoader(val_ds, 2, shuffle=False, num_workers=1, drop_last=False)

    trainer = Trainer(
        ModelConfig(dataset="LSP", num_classes=14),
        TrainConfig(batch_size=2, model_name=str(tmp_path / "unipose")),
        spec=spec,
        loaders=(None, nat),
    )
    mAP_nat = trainer.validation(0)
    trainer.val_loader = py
    mAP_py = trainer.validation(0)
    assert mAP_nat == pytest.approx(mAP_py, abs=0)


@pytest.mark.slow
def test_trainer_logger_and_summary(tmp_path, capsys):
    """TSV logging + param summary through the Trainer surface (reuses the
    synthetic fixtures; model compiles are cached by jit within the run)."""
    from unipose_tpu.train.trainer import Trainer
    from unipose_tpu.utils.logger import Logger

    train_root = make_lsp_root(tmp_path, "lspet2", "lspet", 2)
    val_root = make_lsp_root(tmp_path, "lsp2", "lsp", 1)
    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    loaders = (
        PrefetchLoader(
            LSPDataset("lspet", train_root, 3.0, 8, None, input_size=SIZE),
            2, shuffle=False, num_workers=1,
        ),
        PrefetchLoader(
            LSPDataset("lsp", val_root, 3.0, 8, None, input_size=SIZE),
            1, shuffle=False, num_workers=1, drop_last=False,
        ),
    )
    log_path = str(tmp_path / "train_log.tsv")
    trainer = Trainer(
        ModelConfig(dataset="LSP", num_classes=14),
        TrainConfig(batch_size=2, lr=1e-3, model_name=str(tmp_path / "unipose")),
        spec=spec,
        loaders=loaders,
        log_file=log_path,
        print_summary=True,
    )
    out = capsys.readouterr().out
    assert "Total Parameters:" in out
    trainer.training(0)
    trainer.validation(0)
    resumed = Logger(log_path, resume=True)
    assert resumed.names == ["epoch", "train_loss", "mAP", "mPCK", "mPCKh"]
    assert len(resumed.numbers["mAP"]) == 1
    resumed.close()


@pytest.mark.slow
def test_trainer_test_demo(tmp_path):
    """Trainer.test (demo inference, Reference unipose.py:197-246) renders a
    skeleton and per-channel overlays on the tiny model."""
    import cv2

    from unipose_tpu.train.trainer import Trainer

    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    trainer = Trainer(
        ModelConfig(dataset="LSP", num_classes=14),
        TrainConfig(batch_size=1),
        spec=spec,
        loaders=(None, None),
    )
    img_path = str(tmp_path / "person.jpg")
    cv2.imwrite(
        img_path, np.random.RandomState(0).randint(0, 255, (90, 70, 3), np.uint8)
    )
    kpts = trainer.test(img_path, out_dir=str(tmp_path / "samples"))
    assert len(kpts) == 14
    assert os.path.exists(tmp_path / "samples" / "pose.png")
    assert os.path.exists(tmp_path / "samples" / "heat" / "unipose0.png")
