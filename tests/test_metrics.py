"""Metric parity tests.

The strongest oracle available without network access is the reference's own
``utils/evaluate.py`` (pure numpy): when the reference tree is mounted we load
that single file directly (bypassing its broken package __init__) and compare
outputs bit-for-bit on random heatmaps.  Self-contained semantic tests cover
the rest.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from unipose_tpu.eval.metrics import accuracy, get_max_preds, get_max_preds_device

REF_EVAL = "/root/reference/utils/evaluate.py"


def load_reference_evaluate():
    spec = importlib.util.spec_from_file_location("ref_evaluate", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_EVAL), reason="reference tree not mounted"
)


@needs_reference
@pytest.mark.parametrize(
    "dataset,channels",
    [("LSP", 15), ("MPII", 17), ("Penn_Action", 14), ("BBC", 8)],
)
def test_accuracy_matches_reference(dataset, channels, rng):
    ref = load_reference_evaluate()
    out = rng.rand(1, channels, 46, 46).astype(np.float32)
    tgt = rng.rand(1, channels, 46, 46).astype(np.float32)
    got = accuracy(out, tgt, 0.2, 0.5, dataset)
    want = ref.accuracy(out, tgt, 0.2, 0.5, dataset)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-7)


@needs_reference
def test_get_max_preds_matches_reference(rng):
    ref = load_reference_evaluate()
    hm = rng.rand(3, 5, 46, 46).astype(np.float32)
    hm[0, 0] = 0.5  # constant channel: tie-broken to first index
    hm[1, 2] = -1.0  # all-negative channel: masked to zero
    gp, gv = get_max_preds(hm)
    wp, wv = ref.get_max_preds(hm)
    np.testing.assert_array_equal(gp, wp)
    np.testing.assert_array_equal(gv, wv)


def test_device_argmax_matches_numpy(rng):
    hm = rng.rand(2, 46, 46, 15).astype(np.float32)
    hm[0, :, :, 3] = 0.25  # tie everywhere
    hm[1, :, :, 1] = -0.5  # negative channel -> masked
    gp, gv = get_max_preds_device(jnp.asarray(hm))
    wp, wv = get_max_preds(np.moveaxis(hm, -1, 1))
    np.testing.assert_array_equal(np.asarray(gp), wp)
    np.testing.assert_allclose(np.asarray(gv), wv)


def test_border_targets_masked():
    out = np.zeros((1, 15, 46, 46), np.float32)
    tgt = np.zeros((1, 15, 46, 46), np.float32)
    # target peak at (1,1): coords <= 1 -> masked out (evaluate.py:12-17)
    tgt[0, 1, 1, 1] = 1.0
    out[0, 1, 5, 5] = 1.0
    # channel 2 measurable and correct
    tgt[0, 2, 20, 20] = 1.0
    out[0, 2, 20, 20] = 1.0
    acc, PCK, PCKh, cnt, pred, visible = accuracy(out, tgt, 0.2, 0.5, "LSP")
    assert visible[1] == 0 and visible[2] == 1
    assert acc[2] == 1.0


def test_nhwc_layout_equivalence(rng):
    out = rng.rand(1, 15, 46, 46).astype(np.float32)
    tgt = rng.rand(1, 15, 46, 46).astype(np.float32)
    a = accuracy(out, tgt, 0.2, 0.5, "LSP")
    b = accuracy(
        np.moveaxis(out, 1, -1), np.moveaxis(tgt, 1, -1), 0.2, 0.5, "LSP",
        layout="NHWC",
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_report_formats(capsys):
    from unipose_tpu.eval.report import print_accuracies

    ap = np.linspace(0, 1, 15)
    print_accuracies(0.5, ap, 0.6, ap, 0.7, ap, "LSP")
    out = capsys.readouterr().out
    assert "mAP: 50.00%" in out
    assert "Head Top" in out
