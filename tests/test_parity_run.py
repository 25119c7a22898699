"""End-to-end test of the one-command parity harness (cli/parity_run.py).

A synthetic torch checkpoint (random reference weights, saved exactly like
the reference's ``save_checkpoint`` — utils/utils.py:53-56) plus fixture
LSP data stand in for the real released artifacts: with the SAME weights on
both sides, the harness must conclude PARITY PASS with Δ == 0 and a tiny
heatmap deviation.  The day real artifacts are available, parity is this
one command (docs/ROADMAP.md)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import scipy.io  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference repo not mounted",
)


def _make_lsp_val_root(tmp_path, n):
    """Minimal on-disk LSP val layout (images/ + joints.mat, 'lsp' (3,14,N)
    transposed format with inverted visibility — utils/lsp_lspet_data.py:36)."""
    root = tmp_path / "lsp"
    rng = np.random.RandomState(0)
    os.makedirs(root / "images", exist_ok=True)
    for i in range(n):
        cv2.imwrite(
            str(root / "images" / f"im{i + 1:04d}.jpg"),
            rng.randint(0, 255, (90, 100, 3), np.uint8),
        )
    joints = np.zeros((3, 14, n))
    joints[0] = rng.uniform(10, 90, (14, n))
    joints[1] = rng.uniform(10, 80, (14, n))
    joints[2] = 0.0  # visible (lsp layout inverts)
    scipy.io.savemat(str(root / "joints.mat"), {"joints": joints})
    return str(root)


@pytest.mark.slow
def test_parity_run_same_weights_pass(tmp_path):
    import sys

    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.modules.backbone.resnet as ref_resnet

    ref_resnet.model_zoo.load_url = lambda *a, **k: {}
    import model.unipose as ref_unipose

    torch.manual_seed(0)
    net = ref_unipose.unipose("LSP", num_classes=14, stride=8)
    # perturb BN running stats so the converter's BN path is exercised
    g = torch.Generator().manual_seed(1)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(0.05 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(0.9 + 0.2 * torch.rand(m.running_var.shape, generator=g))
    ckpt = tmp_path / "unipose_synthetic.pth.tar"
    torch.save({"state_dict": net.state_dict()}, str(ckpt))

    val_dir = _make_lsp_val_root(tmp_path, 2)
    out = tmp_path / "verdict.json"

    from unipose_tpu.cli.parity_run import main

    verdict = main([
        "--torch_ckpt", str(ckpt),
        "--val_dir", val_dir,
        "--dataset", "LSP",
        "--max_samples", "2",
        "--out", str(out),
    ])
    assert verdict["pass"] is True
    assert verdict["n"] == 2
    # same weights on both sides: identical metric, near-identical heatmaps
    assert abs(verdict["delta_pt"]) < 1e-9
    assert verdict["worst_joint_delta_pt"] < 1e-9
    # strict on the PCKh axis too (r4 weak #1): all four gates green
    assert abs(verdict["delta_pckh_pt"]) < 1e-9
    assert verdict["worst_joint_delta_pckh_pt"] < 1e-9
    assert all(verdict["gates"].values())
    assert verdict["heatmap_maxnorm_rel_err"] < 5e-4
    assert os.path.exists(out)


def test_parity_run_fails_fast_without_artifacts(tmp_path):
    from unipose_tpu.cli.parity_run import main

    with pytest.raises(SystemExit, match="torch_ckpt"):
        main([
            "--torch_ckpt", str(tmp_path / "missing.pth.tar"),
            "--val_dir", str(tmp_path),
        ])


def _make_penn_val_root(tmp_path, n_clips, nframes):
    """Minimal Penn Action layout: val/<id>.npy dicts + frames/<id>/*.jpg
    (utils/penn_action_data.py:49-56 format)."""
    root = tmp_path / "penn"
    os.makedirs(root / "val", exist_ok=True)
    rng = np.random.RandomState(3)
    for ci in range(n_clips):
        clip = f"{ci + 1:04d}"
        os.makedirs(root / "frames" / clip, exist_ok=True)
        for f in range(nframes):
            cv2.imwrite(
                str(root / "frames" / clip / f"{f + 1:06d}.jpg"),
                rng.randint(0, 255, (90, 120, 3), np.uint8),
            )
        data = {
            "nframes": nframes,
            "framepath": f"frames/{clip}",
            "dimensions": [90, 120],
            "x": rng.uniform(5, 115, (nframes, 13)),
            "y": rng.uniform(5, 85, (nframes, 13)),
            "visibility": np.ones((nframes, 13), np.int64),
        }
        np.save(str(root / "val" / f"{clip}.npy"), data, allow_pickle=True)
    return str(root)


@pytest.mark.slow
def test_parity_run_video_same_weights_pass(tmp_path):
    """The harness's VIDEO branch: reference uniposeLSTM rollout loop in the
    torch worker vs our scanned model, same checkpoint, identical clips."""
    import sys

    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.modules.backbone.resnet as ref_resnet

    ref_resnet.model_zoo.load_url = lambda *a, **k: {}
    torch.Tensor.cuda = lambda self, *a, **k: self
    import model.uniposeLSTM as ref_lstm

    torch.manual_seed(1)
    net = ref_lstm.unipose(num_classes=13, stride=8)
    ckpt = tmp_path / "uniposeLSTM_synthetic.pth.tar"
    torch.save({"state_dict": net.state_dict()}, str(ckpt))

    val_dir = _make_penn_val_root(tmp_path, n_clips=1, nframes=3)

    from unipose_tpu.cli.parity_run import main

    verdict = main([
        "--torch_ckpt", str(ckpt),
        "--val_dir", val_dir,
        "--dataset", "Penn_Action",
        "--model_arch", "uniposeLSTM",
        "--frame_memory", "3",
        "--max_samples", "1",
    ])
    assert verdict["pass"] is True
    assert abs(verdict["delta_pt"]) < 1e-9
    assert abs(verdict["delta_pckh_pt"]) < 1e-9
    assert verdict["worst_joint_delta_pckh_pt"] < 1e-9
    assert all(verdict["gates"].values())
    assert verdict["heatmap_maxnorm_rel_err"] < 5e-3


def test_parity_gates_single_joint_regression_fails():
    """VERDICT r4 weak #1: a regression localized to ONE joint (~1pt on one
    of 14 => <0.1pt on the mean) must NOT pass; neither may a PCKh-only
    regression with PCK identical.  The gate math is pure
    (compute_verdict); the e2e legs above pin that main() routes through
    it with real heatmaps."""
    from unipose_tpu.cli.parity_run import compute_verdict

    k = 14
    ref = np.full(k + 1, 0.95)

    # identical metrics -> every gate green
    v = compute_verdict(ref, ref.copy(), ref, ref.copy(), 0.1, 0.5)
    assert v["pass"] is True and all(v["gates"].values())

    # one joint loses 1pt of PCK: mean delta 1/14 pt ~ 0.071 < 0.1 passes
    # the mean gate but must fail the worst-joint gate
    ours = ref.copy()
    ours[3] -= 0.01
    v = compute_verdict(ref, ours, ref, ref.copy(), 0.1, 0.5)
    assert v["gates"]["mean_pck"] is True
    assert v["gates"]["worst_joint_pck"] is False
    assert v["pass"] is False
    assert v["worst_joint_delta_pt"] == pytest.approx(1.0)

    # PCKh-only regression (PCK identical) must also fail
    v = compute_verdict(ref, ref.copy(), ref, ours, 0.1, 0.5)
    assert v["gates"]["mean_pck"] is True
    assert v["gates"]["worst_joint_pckh"] is False
    assert v["pass"] is False

    # mean-level regression past tolerance fails the mean gate
    v = compute_verdict(ref, ref - 0.002, ref, ref.copy(), 0.1, 0.5)
    assert v["gates"]["mean_pck"] is False
    assert v["pass"] is False
