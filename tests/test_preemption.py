"""Preemption/failure recovery (§5.3): a training process is SIGKILLed mid
run; a fresh process auto-resumes from the surviving orbax checkpoint
(exercises atomic checkpoint commit + restore_latest under *abrupt* death,
not graceful teardown — the preemptible-TPU story).

Checkpoint saves are async (the train loop never stalls on IO), so the
durability contract is *at most one checkpoint interval lost*: a kill right
after ``save(step=k)`` returns may lose step k's write, but any save that a
LATER ``save`` call has been issued past is committed (orbax waits for the
previous async write before starting the next).  The kill therefore lands
after epoch 1's save call, and the resume must see at least epoch 0's step."""

import os
import signal
import subprocess
import sys
import time

import pytest

pytest.importorskip("cv2")
pytest.importorskip("scipy.io")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import cv2, scipy.io

root, ckpt_dir, epochs = sys.argv[1], sys.argv[2], int(sys.argv[3])

# synthetic 4-sample LSPET root
img_dir = os.path.join(root, "images")
if not os.path.isdir(img_dir):
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    n = 4
    for i in range(n):
        cv2.imwrite(os.path.join(img_dir, "im%05d.jpg" % (i + 1)),
                    rng.randint(0, 255, (60, 80, 3), np.uint8))
    joints = np.zeros((14, 3, n))
    joints[:, 0, :] = rng.uniform(5, 75, (14, n))
    joints[:, 1, :] = rng.uniform(5, 55, (14, n))
    joints[:, 2, :] = 1
    scipy.io.savemat(os.path.join(root, "joints.mat"), {"joints": joints})

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.data import transforms as T
from unipose_tpu.data.loader import PrefetchLoader
from unipose_tpu.data.lsp import LSPDataset
from unipose_tpu.train.trainer import Trainer

SIZE = 64
spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
ds = LSPDataset("lspet", root, 3.0, 8, T.Compose([]), input_size=SIZE)
loaders = (PrefetchLoader(ds, 2, shuffle=False, num_workers=1), None, None)
trainer = Trainer(
    ModelConfig(dataset="LSP", num_classes=14),
    TrainConfig(batch_size=2, lr=1e-3, checkpoint_dir=ckpt_dir, model_name=""),
    spec=spec,
    loaders=loaders,
    log_every=100,
)
start_step = int(trainer.state.step)
print("START_STEP", start_step, flush=True)
for e in range(epochs):
    trainer.training(e)
    print("EPOCH_DONE", e, "step", int(trainer.state.step), flush=True)
"""


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    data_root = str(tmp_path / "lspet") + os.sep
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(data_root, exist_ok=True)

    def launch():
        return subprocess.Popen(
            [sys.executable, "-c", WORKER, data_root, ckpt_dir, "5"],
            stdout=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )

    # run 1: SIGKILL right after epoch 1's save call (epoch 0's async write
    # is committed by then — see module docstring)
    p = launch()
    lines = []
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            line = p.stdout.readline()
            if not line:
                break
            lines.append(line.strip())
            if line.startswith("EPOCH_DONE 1"):
                break
        assert any(l.startswith("EPOCH_DONE 1") for l in lines), lines
        os.kill(p.pid, signal.SIGKILL)
    finally:
        p.wait(timeout=60)

    # run 2: fresh process must resume from step > 0, not from scratch
    p = launch()
    try:
        out_lines = []
        deadline = time.time() + 600
        while time.time() < deadline:
            line = p.stdout.readline()
            if not line:
                break
            out_lines.append(line.strip())
            if line.startswith("EPOCH_DONE 0"):
                break
        start = [l for l in out_lines if l.startswith("START_STEP")]
        assert start, out_lines
        resumed_step = int(start[0].split()[1])
        assert resumed_step >= 2, (resumed_step, out_lines)  # 4 samples/batch 2
    finally:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=60)
