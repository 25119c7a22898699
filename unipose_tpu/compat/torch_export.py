"""JAX variables -> PyTorch ``state_dict`` exporter (inverse of
``torch_convert.convert_state_dict``).

Lets weights trained here flow back to a reference-torch user
(Reference: the load side is unipose.py:79-90; key names are pinned by the
param-tree naming convention, docs/PARITY.md).  Inverse transforms:

  * conv kernels HWIO -> OIHW (4-D ``weight`` leaves);
  * batch_stats ``running_mean``/``running_var`` re-merged beside their
    module's params; ``num_batches_tracked`` synthesized as 0 (torch tracks
    it but never uses it with ``momentum`` set);
  * UniPose-LSTM fused gates (``conv_x_gates``/``conv_h_gates``) split back
    into per-gate ``conv_{g,i,o,f}{x,h}_lstm`` tensors in gate order
    (Reference: model/uniposeLSTM.py:30-38);
  * the video head (``head.conv1..5``) re-rooted to top-level ``conv1..5``
    (Reference: model/uniposeLSTM.py:85-89).

Round-trip pinned by tests/test_compat.py: export -> convert == identity.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from unipose_tpu.compat.torch_convert import GATE_ORDER


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export_state_dict(
    variables: Mapping[str, Any], *, variant: str = "image"
) -> Dict[str, np.ndarray]:
    """Flatten a flax ``variables`` tree ({"params", "batch_stats"}) into a
    torch-keyed ``state_dict`` of numpy arrays (pass through
    ``torch.from_numpy`` to feed ``load_state_dict``)."""
    import jax

    # One batched transfer up front: per-leaf np.asarray on device-resident
    # trees would cost a ~24 ms tunnel round trip per leaf (~800 leaves for
    # ResNet-101+WASP — tens of seconds; CLAUDE.md "Environment quirks").
    variables = jax.device_get(
        {
            "params": variables.get("params", {}),
            "batch_stats": variables.get("batch_stats", {}),
        }
    )
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])

    out: Dict[str, np.ndarray] = {}

    for key, value in flat.items():
        parts = key.split(".")
        if variant == "lstm" and parts[0] == "lstm" and parts[1] in (
            "conv_x_gates",
            "conv_h_gates",
        ):
            xh = "x" if parts[1] == "conv_x_gates" else "h"
            wb = parts[2]
            if wb == "weight":  # HWIO -> OIHW before splitting along O
                value = value.transpose(3, 2, 0, 1)
            per_gate = np.split(value, len(GATE_ORDER), axis=0)
            for g, gv in zip(GATE_ORDER, per_gate):
                out[f"lstm.conv_{g}{xh}_lstm.{wb}"] = gv
            continue
        if variant == "lstm" and parts[0] == "head":
            parts = parts[1:]  # head.convN.* -> convN.* (uniposeLSTM.py:85-89)
        if value.ndim == 4 and parts[-1] == "weight":
            value = value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[".".join(parts)] = value

    for key, value in stats.items():
        parts = key.split(".")
        out[".".join(parts)] = value
        if parts[-1] == "running_var":
            out[".".join(parts[:-1] + ["num_batches_tracked"])] = np.asarray(
                0, np.int64
            )

    return out
