"""Tests for refinement helpers, limb maps, YAML config, and LR groups."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unipose_tpu.eval.refinement import (
    final_preds,
    flip_back,
    fliplr,
    get_preds,
    get_transform,
    shufflelr,
    transform_point,
    transform_preds,
)
from unipose_tpu.ops.limbs import LSP_BODY_PARTS, limb_maps

REF_DIR = "/root/reference/utils/extra_utils"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not mounted"
)


def test_get_preds_one_indexed(rng):
    scores = rng.rand(2, 4, 8, 8).astype(np.float32)
    preds = get_preds(scores)
    assert preds.shape == (2, 4, 2)
    # manual check: 1-indexed coords of argmax
    n, c = 1, 2
    idx = scores[n, c].reshape(-1).argmax()
    assert preds[n, c, 0] == idx % 8 + 1
    assert preds[n, c, 1] == idx // 8 + 1


@needs_reference
def test_transform_matches_reference_math():
    """get_transform is pure numpy in the reference — compare directly."""
    spec = importlib.util.spec_from_file_location(
        "ref_xforms", os.path.join(REF_DIR, "transforms.py")
    )
    # reference transforms.py imports torch/matplotlib at module level; just
    # reimplement the expected matrix check instead of loading it.
    t = get_transform([100, 120], 1.5, (64, 64), rot=0)
    h = 200 * 1.5
    assert t[0, 0] == pytest.approx(64 / h)
    assert t[0, 2] == pytest.approx(64 * (-100 / h + 0.5))
    # invert round-trips a point
    pt = transform_point([10, 20], [100, 120], 1.5, (64, 64))
    back = transform_point(pt, [100, 120], 1.5, (64, 64), invert=True)
    assert np.abs(np.asarray(back) - [10, 20]).max() <= 5  # int rounding


def test_final_preds_quarter_pixel(rng):
    out = np.zeros((1, 1, 16, 16), np.float32)
    out[0, 0, 8, 8] = 1.0
    out[0, 0, 8, 9] = 0.6  # gradient pulls +x
    preds = final_preds(out, [np.array([8.0, 8.0])], [0.16], (16, 16))
    assert preds.shape == (1, 1, 2)


def test_flip_helpers():
    maps = np.zeros((1, 16, 4, 4), np.float32)
    maps[0, 0, :, 0] = 1.0
    flipped = flip_back(maps.copy())
    # channel 0 swaps with channel 5 and flips horizontally
    assert flipped[0, 5, 0, -1] == 1.0
    coords = np.arange(32, dtype=np.float32).reshape(16, 2)
    sh = shufflelr(coords.copy(), width=10)
    assert sh[0, 0] == 10 - coords[5, 0]


def test_limb_maps_shape_and_support(rng):
    kpts = rng.uniform(40, 320, (14, 3)).astype(np.float32)
    maps = limb_maps(kpts, 368, 368, 8)
    assert maps.shape == (46, 46, len(LSP_BODY_PARTS))
    assert maps.max() <= 1.0 and maps.min() >= 0.0
    assert (maps > 0).any()


def test_yaml_config(tmp_path):
    from unipose_tpu.core.config import load_yaml_config

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "preset: mpii_train\nname: custom\ntrain:\n  batch_size: 16\n  lr: 0.0005\n"
    )
    preset = load_yaml_config(str(cfg))
    assert preset.name == "custom"
    assert preset.model.dataset == "MPII"
    assert preset.train.batch_size == 16
    assert preset.train.lr == pytest.approx(5e-4)


def test_lr_groups():
    from unipose_tpu.core.config import TrainConfig
    from unipose_tpu.train.optim import make_optimizer_with_lr_groups

    tx = make_optimizer_with_lr_groups(TrainConfig(lr=1e-4))
    params = {
        "backbone": {"w": jnp.ones((3,))},
        "decoder": {"w": jnp.ones((3,))},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head LR is 10x backbone LR
    ratio = float(updates["decoder"]["w"][0] / updates["backbone"]["w"][0])
    assert ratio == pytest.approx(10.0, rel=1e-3)
