"""Learning validation (VERDICT r3 next-round #1): the COMPOSED training
system — loaders, device-side Gaussian targets, LR schedule, BN EMA under
donation, dropout keys, loss, eval argmax — must learn to localize joints,
not merely decrease a loss for a few steps.

The convergence numbers live in docs/BENCHMARKS.md "Learning validation"
(TPU, `scripts/train_synthetic.py`): image 95.1% held-out PCK@0.2 from
scratch in 27 epochs; video 99.9% with the reference's own warm-start +
lr 1e-4 recipe in 12 epochs; int8 Δ +0.2pt on the trained weights; plus
the CP-mesh check (`scripts/cp_learning_check.py`).  These @slow tests pin
a reduced in-suite version on the 8-device CPU mesh — budgets calibrated
by pilot runs on this 1-vCPU box (84 steps ≈ 13 min → PCK 0.176 vs
untrained floor 0.009) — so a regression in any composed-training part
fails CI, and the result is cross-scored through the live reference
``evaluate.py`` oracle when the mount is present.

Reference being matched: unipose.py:100-193 — the loop whose end product
is the paper's numbers.
"""

import dataclasses
import importlib.util
import os

import numpy as np
import pytest

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.data.synthetic import make_loaders

REFERENCE = "/root/reference"


def _load_reference_evaluate():
    path = os.path.join(REFERENCE, "utils", "evaluate.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("ref_evaluate", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _oracle_pck(trainer, loader):
    """Score held-out PCK@0.2 through the REFERENCE evaluate.accuracy (NCHW
    heatmaps) with the reference's running-mean/visibility accumulation
    (unipose.py:163-176).  Returns None when the mount is absent."""
    ref = _load_reference_evaluate()
    if ref is None:
        return None
    import jax.numpy as jnp

    from unipose_tpu.train.steps import make_targets, preprocess_images

    k = trainer.model_config.num_classes
    PCK = np.zeros(k + 1)
    count = np.zeros(k + 1)
    n_frames = 0
    for batch in loader:
        x = preprocess_images(jnp.asarray(batch["image"]))
        out = trainer.model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            x,
            train=False,
        )
        tgt = make_targets(jnp.asarray(batch["kpts"]), trainer.spec)
        out_nchw = np.moveaxis(np.asarray(out), -1, 1)
        tgt_nchw = np.moveaxis(np.asarray(tgt), -1, 1)
        for i in range(out_nchw.shape[0]):
            _, acc_PCK, _, _, _, visible = ref.accuracy(
                out_nchw[i : i + 1], tgt_nchw[i : i + 1], 0.2, 0.5, "LSP"
            )
            for j in range(1, k + 1):
                if visible[j] == 1:
                    PCK[j] = (PCK[j] * count[j] + acc_PCK[j]) / (count[j] + 1)
                    count[j] += 1
            n_frames += 1
    assert n_frames > 0
    return PCK[1:].sum() / k


@pytest.mark.slow
def test_image_learns_to_localize_on_synthetic(tmp_path):
    """Bounded in-suite learning check: 12 epochs (72 steps) of the real
    Trainer at 96px must lift held-out PCK@0.2 an order of magnitude above
    the untrained floor and collapse the loss.  Calibrated pilot (this
    box): floor 0.009 -> 0.10 at epoch 11, 0.18 at epoch 12; loss 11.9 ->
    1.1.  A broken composed system (targets misaligned, stale BN under
    donation, dead LR wiring) stays at the floor — the full convergence
    claim (95.1% @ 184px) is the TPU run in BENCHMARKS."""
    from unipose_tpu.train.trainer import Trainer

    SIZE = 96
    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(
        batch_size=8,
        lr=3e-4,
        sigma=1.5,  # sharper targets at the coarse 12x12 heatmap
        model_name="",  # no checkpoint writes
        mesh_shape=(-1,),
        val_batch_size=8,
    )
    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    loaders = make_loaders(
        "image",
        input_size=SIZE,
        train_samples=48,
        val_samples=16,
        batch_size=8,
        seed=0,
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=10)

    floor = trainer.validation(-1)  # untrained mAP (pck floor ~0.009)
    floor_pck = trainer.best_pck
    first_loss = None
    for epoch in range(12):
        loss = trainer.training(epoch)
        first_loss = first_loss if first_loss is not None else loss
        trainer.validation(epoch)
        if trainer.best_pck >= 0.12:
            break
    assert trainer.best_pck >= 0.08, (
        f"PCK@0.2 stuck at {trainer.best_pck:.4f} "
        f"(untrained floor {floor_pck:.4f}, mAP floor {floor:.4f})"
    )
    assert trainer.best_pck >= 5 * max(floor_pck, 0.01)
    assert loss < first_loss / 4, (first_loss, loss)

    # cross-score the same trained model through the reference's own metric
    oracle = _oracle_pck(trainer, loaders[1])
    if oracle is not None:
        assert abs(oracle - trainer.best_pck) < 0.05, (
            f"our PCK {trainer.best_pck:.4f} vs reference-oracle {oracle:.4f}"
        )


@pytest.mark.slow
def test_video_trains_under_cp_mesh(tmp_path):
    """The video variant under the real (data, time) CP mesh TRAINS: loss
    collapses over a bounded budget and validation executes end-to-end on
    the sharded program.  Numeric exactness of CP vs unsharded is pinned in
    tests/test_cp.py; checkpoint-level PCK preservation under CP is
    `scripts/cp_learning_check.py` (BENCHMARKS)."""
    from unipose_tpu.train.trainer import Trainer

    SIZE = 64
    T = 4
    mc = ModelConfig(
        dataset="LSP",
        num_classes=14,
        variant="lstm",
        frame_memory=T,
        spmd_axes=("data", "time"),
    )
    tc = TrainConfig(
        batch_size=2,
        lr=3e-4,
        sigma=1.5,
        model_name="",
        mesh_shape=(2, 4),
        mesh_axes=("data", "time"),
        val_batch_size=2,
    )
    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    loaders = make_loaders(
        "lstm",
        input_size=SIZE,
        train_samples=8,
        val_samples=4,
        batch_size=2,
        frame_memory=T,
        seed=5,
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=10)

    # calibrated on this box: losses 0.399 -> 0.194 (5 ep) -> 0.096 (8 ep)
    losses = []
    for epoch in range(8):
        losses.append(trainer.training(epoch))
        if losses[-1] < losses[0] / 3:
            break
    assert losses[-1] < losses[0] / 2.5, losses
    mAP = trainer.validation(0)
    assert 0.0 <= mAP <= 1.0
