"""BBC long-video end-to-end path (BASELINE config 4): synthetic BBC-format
root -> BBCDataset(seq_len>1) -> chunked streaming eval carrying the ConvLSTM
state across >2 chunks -> per-frame PCK.

The pieces are unit-tested individually (tests/test_datasets.py BBC fixtures,
tests/test_models.py streaming state); this composes them the way the config-4
recipe would run on a real BBC video."""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
scipy = pytest.importorskip("scipy.io")

import jax

from unipose_tpu.core.config import DATASETS, ModelConfig
from unipose_tpu.data.bbc import BBCDataset
from unipose_tpu.eval.metrics import accuracy
from unipose_tpu.eval.video import stream_video
from unipose_tpu.models.unipose import build_model
from unipose_tpu.train.steps import make_targets

SIZE = 64
T_TOTAL = 12
CHUNK = 4  # 12 frames -> 3 chunks (>2, exercises first + 2 carried chunks)


@pytest.fixture
def bbc_video_root(tmp_path):
    import scipy.io

    root = tmp_path / "bbc"
    rng = np.random.RandomState(7)
    vid = 11  # val split base
    frames = np.arange(1, T_TOTAL + 1, dtype=np.float64)
    joints = rng.uniform(450, 780, (T_TOTAL, 7, 2))
    os.makedirs(root / "labels" / "val" / "imageFiles", exist_ok=True)
    os.makedirs(root / "labels" / "val" / "joints", exist_ok=True)
    scipy.io.savemat(
        str(root / "labels" / "val" / "imageFiles" / f"{vid}_imageFiles.mat"),
        {"imageFile": frames},
    )
    scipy.io.savemat(
        str(root / "labels" / "val" / "joints" / f"{vid}_jointFiles.mat"),
        {"joints": joints},
    )
    os.makedirs(root / "BBCpose" / str(vid), exist_ok=True)
    for f in range(T_TOTAL):
        img = rng.randint(0, 255, (800, 800, 3), np.uint8)
        cv2.imwrite(str(root / "BBCpose" / str(vid) / f"{f + 1}.jpg"), img)
    return str(root) + "/"


@pytest.mark.slow
def test_bbc_stream_eval_end_to_end(bbc_video_root):
    # whole-video window straight from the loader
    ds = BBCDataset(bbc_video_root, 1.0, "Val", seq_len=T_TOTAL)
    assert len(ds) == 1
    sample = ds[0]
    frames368 = sample["frames"]  # (T, 368, 368, 3)
    assert frames368.shape == (T_TOTAL, 368, 368, 3)

    # shrink to the tiny-model size (keeps CPU compile/runtime sane)
    scale = SIZE / 368.0
    frames = np.stack(
        [cv2.resize(f, (SIZE, SIZE)) for f in frames368]
    ).astype(np.float32)[None]
    kpts = sample["kpts"].copy()[None]
    kpts[..., :2] *= scale
    centers = (sample["centers"] * scale).astype(np.float32)[None]

    spec = dataclasses.replace(DATASETS["BBC"], input_size=SIZE)
    mc = ModelConfig(
        dataset="BBC", num_classes=7, variant="lstm", frame_memory=CHUNK
    )
    model = build_model(mc)
    variables = jax.jit(lambda k, f, c: model.init(k, f, c, train=False))(
        jax.random.PRNGKey(0),
        np.zeros((1, CHUNK, SIZE, SIZE, 3), np.float32),
        np.zeros((1, CHUNK, SIZE, SIZE, 1), np.float32),
    )

    heat = stream_video(
        model,
        variables["params"],
        variables["batch_stats"],
        frames,
        centers,
        spec,
        chunk=CHUNK,
    )
    h = SIZE // spec.stride
    assert heat.shape == (1, T_TOTAL, h, h, spec.num_channels)
    assert np.isfinite(heat).all()

    # chunked streaming must equal one uninterrupted 12-frame rollout:
    # the carried (cell, hide) state is what makes config 4 "long sequences
    # through the LSTM scan" rather than reset 5-frame windows.
    from unipose_tpu.train.steps import make_centermaps, preprocess_images

    full = model.apply(
        variables,
        preprocess_images(frames),
        make_centermaps(centers, spec),
        train=False,
    )
    # atol: tower batching differs (B*T=12 in one apply vs 4-frame chunks),
    # so conv reduction order differs; observed max |Δ| ≈ 2.5e-5 f32.
    np.testing.assert_allclose(heat, np.asarray(full), rtol=0, atol=2e-4)

    # per-frame PCK over the whole video (uniposeLSTM.py:140-217 semantics)
    targets = np.asarray(make_targets(kpts, spec))
    for t in range(T_TOTAL):
        _, pck, _, _, _, _ = accuracy(
            heat[:, t], targets[:, t], 0.2, 0.5, "BBC", layout="NHWC"
        )
        assert np.isfinite(pck[0])
        assert 0.0 <= pck[0] <= 1.0
