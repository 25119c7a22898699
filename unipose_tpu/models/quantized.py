"""UniPose image forward with a w8a8 int8 front end — inference/serving only.

The bandwidth-bound ResNet front end (stem+layer1+layer2; 58% of backbone
time at 13% of FLOPs) runs quantized (``ops/quant.py``): int8 tensors between
convs, s8*s8->s32 on the MXU, static calibrated activation scales.  Layer3/4,
WASP and the decoder — the MXU-bound majority of the FLOPs — run the normal
bf16 modules on the same variables tree, so the parameter layout, converter,
and checkpoints are untouched.

This is an opt-in numerics trade (measured drift on synthetic weights in
``scripts/profile_int8.py``; accuracy study on real checkpoints parked per
docs/ROADMAP.md) — exposed through ``cli/export --int8-frontend`` for serving
artifacts, never through training.

Reference mapping: the assembled graph is exactly model/unipose.py:27-38
(backbone -> wasp -> decoder, stride-8 output); only the arithmetic of the
first three backbone stages changes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from unipose_tpu.models.decoder import Decoder
from unipose_tpu.models.resnet import _Stage
from unipose_tpu.models.wasp import WASP
from unipose_tpu.ops import quant


@dataclasses.dataclass
class Int8Frontend:
    """Prepared (offline) quantization state for the front end."""

    qconvs: Dict[str, quant.QuantConv]
    act_scales: Dict[str, float]


def prepare_int8_frontend(variables: Dict, calib_x: jnp.ndarray) -> Int8Frontend:
    """Fold BN, quantize weights, and calibrate activation scales from one
    representative batch.  ``variables`` is the full UniPose tree (the
    backbone lives under ``params/backbone``)."""
    backbone = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    folded = quant.fold_frontend(backbone)
    scales = quant.calibrate_frontend(folded, calib_x)
    return Int8Frontend(qconvs=quant.quantize_frontend(folded), act_scales=scales)


def _sub(variables: Dict, *path: str) -> Dict:
    out = {}
    for col in ("params", "batch_stats"):
        tree = variables[col]
        for p in path:
            tree = tree[p]
        out[col] = tree
    return out


def int8_image_forward(
    variables: Dict,
    fe: Int8Frontend,
    x: jnp.ndarray,
    *,
    num_classes: int = 14,
    output_stride: int = 16,
    wasp_double_conv2: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Eval-mode UniPose forward: int8 front end + bf16 layer3/4+WASP+decoder.

    Only ``output_stride=16`` (the reference's configuration) is assembled;
    the stage strides/dilations below mirror ``ResNet101.__call__``.
    """
    if output_stride != 16:
        raise NotImplementedError("int8 frontend is assembled for output_stride=16")

    out2, low_level = quant.frontend_int8(
        fe.qconvs, fe.act_scales, x, out_dtype=dtype, return_low=True
    )

    layer3 = _Stage(256, [2] + [1] * 22, [1] * 23, True, dtype=dtype, name="layer3")
    h = layer3.apply(_sub(variables, "backbone", "layer3"), out2, train=False)
    # layer4: multi-grid (1,2,4) * dilation 2 at stride 1 (ResNet101.__call__)
    layer4 = _Stage(512, [1, 1, 1], [2, 4, 8], True, dtype=dtype, name="layer4")
    h = layer4.apply(_sub(variables, "backbone", "layer4"), h, train=False)

    wasp = WASP(
        output_stride=output_stride, double_conv2=wasp_double_conv2, dtype=dtype
    )
    h = wasp.apply(_sub(variables, "wasp"), h, train=False)

    decoder = Decoder(num_classes, dtype=dtype)
    y = decoder.apply(_sub(variables, "decoder"), h, low_level, train=False)
    return y.astype(jnp.float32)


def int8_forward_fn(
    variables: Dict,
    calib_x: jnp.ndarray,
    *,
    num_classes: int = 14,
    wasp_double_conv2: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[Int8Frontend, "jax.stages.Wrapped"]:
    """Prepare the quantized front end and return (state, jitted forward)."""
    fe = prepare_int8_frontend(variables, calib_x)

    @jax.jit
    def forward(x):
        return int8_image_forward(
            variables,
            fe,
            x,
            num_classes=num_classes,
            wasp_double_conv2=wasp_double_conv2,
            dtype=dtype,
        )

    return fe, forward
