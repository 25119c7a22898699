"""Learning validation (VERDICT r3 next-round #1): the COMPOSED training
system — loaders, device-side Gaussian targets, LR schedule, BN EMA under
donation, dropout keys, loss, eval argmax — must learn to localize joints,
not merely decrease a loss for a few steps.

The full-scale convergence runs (image + LSTM on TPU at 184px, and the LSTM
variant under the CPU CP mesh) are executed by ``scripts/train_synthetic.py``
and recorded in docs/BENCHMARKS.md ("learning validation"); these @slow
tests pin a reduced version in-suite on the 8-device CPU mesh so a
regression in any composed-training part fails CI, and score the result
through the reference ``evaluate.py`` oracle when the reference mount is
present.

Reference to match: unipose.py:100-193 — the loop whose end product is the
paper's numbers.
"""

import dataclasses
import importlib.util
import os
import sys

import numpy as np
import pytest

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.data.synthetic import SyntheticPoseLoader, make_loaders

REFERENCE = "/root/reference"


def _load_reference_evaluate():
    path = os.path.join(REFERENCE, "utils", "evaluate.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("ref_evaluate", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _oracle_pck(trainer, loader, spec):
    """Score held-out PCK@0.2 through the REFERENCE evaluate.accuracy (NCHW
    heatmaps), with the reference's running-mean/visibility accumulation
    (unipose.py:163-176).  Returns None when the mount is absent."""
    ref = _load_reference_evaluate()
    if ref is None:
        return None
    import jax.numpy as jnp

    from unipose_tpu.train.steps import make_targets, preprocess_images

    k = spec.num_joints
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
            acc, acc_PCK, acc_PCKh, cnt, pred, visible = ref.accuracy(
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
def test_image_trains_to_pck_on_synthetic(tmp_path):
    """Train the real image model via the real Trainer on the CPU mesh until
    held-out PCK@0.2 clears a pinned threshold.  The joints carry unique
    color markers (data/synthetic.py) — a correct composed system reaches
    near-perfect PCK; wiring bugs (targets misaligned with inputs, stale BN
    stats under donation, broken LR schedule) hold it near zero."""
    from unipose_tpu.train.trainer import Trainer

    SIZE = 96  # heatmap 12x12; torso ~3-5 hm px -> PCK tol ~1 px (exact argmax)
    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(
        batch_size=8,
        lr=5e-4,
        sigma=1.5,  # sharper targets at the coarse 12x12 resolution
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
        seed=3,
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=10)

    target = 0.90
    pck = 0.0
    for epoch in range(30):
        trainer.training(epoch)
        trainer.validation(epoch)
        pck = trainer.best_pck
        if pck >= target:
            break
    assert pck >= target, f"held-out PCK@0.2 stuck at {pck:.3f} after {epoch + 1} epochs"

    # score through the reference oracle when available: same data, same
    # trained model, the reference's own metric code
    oracle = _oracle_pck(trainer, loaders[1], spec)
    if oracle is not None:
        assert oracle >= target - 0.05, f"reference-oracle PCK {oracle:.3f}"


@pytest.mark.slow
def test_lstm_learns_under_cp_mesh(tmp_path):
    """The video variant under the (data, time) CP mesh LEARNS — the
    sharded program trains, not merely compiles: PCK@0.2 must rise far
    above the random-argmax floor within a bounded budget.  (Full
    convergence of the LSTM variant is the TPU run in BENCHMARKS; this
    bounds CI time.)"""
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
        lr=5e-4,
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
        train_samples=12,
        val_samples=4,
        batch_size=2,
        frame_memory=T,
        seed=5,
    )
    trainer = Trainer(mc, tc, spec=spec, loaders=loaders, log_every=10)

    base_map = trainer.validation(-1)  # untrained floor
    for epoch in range(6):
        trainer.training(epoch)
        trainer.validation(epoch)
        if trainer.best_pck >= 0.5:
            break
    assert trainer.best_pck >= 0.5, (
        f"CP-mesh video training stuck: PCK {trainer.best_pck:.3f} "
        f"(untrained mAP {base_map:.3f})"
    )
