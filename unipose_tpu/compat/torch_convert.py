"""PyTorch checkpoint -> JAX variables converter.

Mirrors the reference's key-intersection partial-load semantics
(Reference: unipose.py:79-90 — unknown keys are skipped, missing keys keep
their current values) on top of the layout transforms a TPU-native tree
needs:

  * conv weights: OIHW -> HWIO;
  * BatchNorm: ``weight``/``bias`` -> params, ``running_mean``/``running_var``
    -> batch_stats, ``num_batches_tracked`` dropped;
  * UniPose-LSTM per-gate convs (``conv_{g,i,o,f}{x,h}_lstm``,
    Reference: model/uniposeLSTM.py:30-38) packed into the fused
    ``conv_x_gates``/``conv_h_gates`` kernels in gate order (g, i, o, f);
  * the video model's top-level head convs (``conv1..conv5``,
    Reference: model/uniposeLSTM.py:85-89) re-rooted under ``head``;
  * dead reference params (``decoder.conv2/bn2``, decoder.py:20-21) fall out
    naturally via key intersection.

Also exposes NCHW<->NHWC helpers for interop at the API edge.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


GATE_ORDER = ("g", "i", "o", "f")
_LSTM_GATE_RE = re.compile(r"^lstm\.conv_([giof])([xh])_lstm\.(weight|bias)$")
_HEAD_RE = re.compile(r"^conv([1-5])\.(weight|bias)$")


def to_nhwc(x: np.ndarray) -> np.ndarray:
    """(..., C, H, W) -> (..., H, W, C)."""
    return np.moveaxis(np.asarray(x), -3, -1)


def to_nchw(x: np.ndarray) -> np.ndarray:
    """(..., H, W, C) -> (..., C, H, W)."""
    return np.moveaxis(np.asarray(x), -1, -3)


_TORCH_READ_CHILD = """
import sys
import numpy as np
import torch

blob = torch.load(sys.argv[1], map_location="cpu", weights_only=False)
state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
out = {}
for k, v in state.items():
    if k.startswith("module."):
        k = k[len("module."):]
    out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
np.savez(sys.argv[2], **out)
"""


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``*.pth.tar`` checkpoint to a flat {key: np.ndarray} dict.

    Accepts either a raw state_dict or the reference's
    ``{'state_dict': ...}`` wrapper (utils/utils.py:53-56); strips any
    ``module.`` DataParallel prefix.

    The torch read runs in a SUBPROCESS unless torch is already imported:
    importing torch into a process whose axon TPU client is live deadlocks
    (CLAUDE.md environment quirks), and the warm-start path
    (``cli.train --pretrained`` on a TPU host) hits exactly that order —
    jax initializes during model init, the checkpoint loads after.  The
    child imports only torch+numpy (never jax) and hands the tensors back
    through an ``.npz``.
    """
    import sys

    if "torch" in sys.modules:  # already coexisting (CPU tests) — cheap path
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
        state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
        out = {}
        for k, v in state.items():
            if k.startswith("module."):
                k = k[len("module.") :]
            out[k] = (
                v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            )
        return out

    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        npz = f"{td}/state.npz"
        subprocess.run(
            [sys.executable, "-c", _TORCH_READ_CHILD, path, npz],
            check=True,
        )
        with np.load(npz, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}


def _assign(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> bool:
    """Key-intersection assignment: only write if the full path already
    exists with a matching shape."""
    node = tree
    for p in path[:-1]:
        if not isinstance(node, Mapping) or p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if not isinstance(node, Mapping) or leaf not in node:
        return False
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        return False
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def convert_state_dict(
    state: Mapping[str, np.ndarray],
    variables: Mapping[str, Any],
    *,
    variant: str = "image",
    key_prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Convert a torch ``state_dict`` into a flax ``variables`` tree.

    Args:
      state: flat torch key -> array mapping (OIHW conv layout).
      variables: template variables tree (from ``model.init``); values are
        replaced by key intersection, everything else is preserved.
      variant: "image" (model/unipose.py tree) or "lstm"
        (model/uniposeLSTM.py tree, with gate packing and head re-rooting).
      key_prefix: prepended to every torch key before matching — e.g.
        ``"backbone."`` to load a raw torchvision ImageNet resnet101
        checkpoint into the backbone subtree, mirroring the reference's
        pretrained init (resnet.py:138-150).

    Returns:
      (new_variables, report) where report lists 'loaded' and 'skipped' torch
      keys.
    """
    if key_prefix:
        state = {key_prefix + k: v for k, v in state.items()}
    out = _to_mutable(variables)
    report = {"loaded": [], "skipped": []}

    # Collect LSTM gate tensors for fused packing.
    gate_store: Dict[Tuple[str, str], Dict[str, np.ndarray]] = {}

    for key, value in state.items():
        value = np.asarray(value)
        parts = key.split(".")
        leaf = parts[-1]

        if leaf == "num_batches_tracked":
            continue

        if variant == "lstm":
            m = _LSTM_GATE_RE.match(key)
            if m:
                gate, xh, wb = m.groups()
                gate_store.setdefault((xh, wb), {})[gate] = value
                continue
            m = _HEAD_RE.match(key)
            if m:
                parts = ["head", f"conv{m.group(1)}", m.group(2)]
                leaf = parts[-1]

        collection = (
            "batch_stats" if leaf in ("running_mean", "running_var") else "params"
        )
        if value.ndim == 4:  # conv kernel OIHW -> HWIO
            value = value.transpose(2, 3, 1, 0)
        path = (collection, *parts)
        if _assign(out, path, value):
            report["loaded"].append(key)
        else:
            report["skipped"].append(key)

    if variant == "lstm":
        for (xh, wb), gates in gate_store.items():
            if set(gates) != set(GATE_ORDER):
                report["skipped"].extend(
                    f"lstm.conv_{g}{xh}_lstm.{wb}" for g in gates
                )
                continue
            packed = np.concatenate([gates[g] for g in GATE_ORDER], axis=0)
            if wb == "weight":
                packed = packed.transpose(2, 3, 1, 0)
            target = "conv_x_gates" if xh == "x" else "conv_h_gates"
            path = ("params", "lstm", target, wb)
            if _assign(out, path, packed):
                report["loaded"].extend(
                    f"lstm.conv_{g}{xh}_lstm.{wb}" for g in GATE_ORDER
                )
            else:
                report["skipped"].extend(
                    f"lstm.conv_{g}{xh}_lstm.{wb}" for g in GATE_ORDER
                )

    return out, report
