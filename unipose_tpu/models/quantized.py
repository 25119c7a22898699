"""UniPose forwards (image and video) with a w8a8 int8 front end —
inference/serving only.

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

Reference mapping: the assembled graphs are exactly model/unipose.py:27-38
(image: backbone -> wasp -> decoder, stride-8 output) and
model/uniposeLSTM.py:98-147 (video: per-frame tower + ConvLSTM + 11x11
head, as restructured in models/unipose_lstm.py); only the arithmetic of
the first three backbone stages changes.
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


def int8_video_forward(
    variables: Dict,
    fe: Int8Frontend,
    frames: jnp.ndarray,
    centermap: jnp.ndarray,
    *,
    num_classes: int = 13,
    output_stride: int = 16,
    wasp_double_conv2: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Eval-mode UniPose-LSTM forward with the int8 front end.

    Mirrors ``UniPoseLSTM.__call__`` (models/unipose_lstm.py) exactly —
    batched B*T tower, ConvLSTM0 first frame, scanned cell, batched head —
    with the backbone's stem+layer1+layer2 quantized.  Fresh-state clips
    only (the serving artifact shape; streaming eval keeps the bf16 path).
    """
    from flax import linen as nn

    from unipose_tpu.models.unipose_lstm import ConvLSTM0, ConvLSTMCell, LSTMHead
    from unipose_tpu.ops.pooling import avg_pool2d

    if output_stride != 16:
        raise NotImplementedError("int8 frontend is assembled for output_stride=16")
    b, t, h, w, _ = frames.shape
    lstm_ch = num_classes + 2

    x = frames.reshape(b * t, h, w, frames.shape[-1])
    out2, low_level = quant.frontend_int8(
        fe.qconvs, fe.act_scales, x, out_dtype=dtype, return_low=True
    )
    layer3 = _Stage(256, [2] + [1] * 22, [1] * 23, True, dtype=dtype, name="layer3")
    feats = layer3.apply(_sub(variables, "backbone", "layer3"), out2, train=False)
    layer4 = _Stage(512, [1, 1, 1], [2, 4, 8], True, dtype=dtype, name="layer4")
    feats = layer4.apply(_sub(variables, "backbone", "layer4"), feats, train=False)

    wasp = WASP(
        output_stride=output_stride,
        double_conv2=wasp_double_conv2,
        gap_batchnorm=False,  # video WASP quirk (waspVideo.py:56-59)
        dtype=dtype,
    )
    y = wasp.apply(_sub(variables, "wasp"), feats, train=False)
    decoder = Decoder(num_classes, dtype=dtype)
    y = decoder.apply(_sub(variables, "decoder"), y, low_level, train=False)

    cm = avg_pool2d(centermap.reshape(b * t, h, w, 1).astype(y.dtype), 9, 8, 1)
    z = jnp.concatenate([y, cm], axis=-1)
    h8, w8 = z.shape[1:3]
    z = jnp.moveaxis(z.reshape(b, t, h8, w8, lstm_ch), 1, 0)  # time-major

    cell0, hide0 = ConvLSTM0(lstm_ch, dtype=dtype).apply(
        {"params": variables["params"]["lstm_0"]}, z[0]
    )
    cell0, hide0 = cell0.astype(jnp.float32), hide0.astype(jnp.float32)
    scanned = nn.scan(
        ConvLSTMCell,
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": False},
        in_axes=0,
        out_axes=0,
    )(lstm_ch, dtype=dtype)
    (_, _), hides = scanned.apply(
        {"params": variables["params"]["lstm"]}, (cell0, hide0), z[1:]
    )
    hides = jnp.concatenate([hide0[None].astype(hides.dtype), hides], axis=0)

    hides_bt = jnp.moveaxis(hides, 0, 1).reshape(b * t, h8, w8, lstm_ch)
    heat = LSTMHead(num_classes + 1, dtype=dtype).apply(
        {"params": variables["params"]["head"]}, hides_bt
    )
    return heat.reshape(b, t, h8, w8, num_classes + 1).astype(jnp.float32)


def int8_video_forward_fn(
    variables: Dict,
    calib_frames: jnp.ndarray,
    *,
    num_classes: int = 13,
    wasp_double_conv2: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[Int8Frontend, "jax.stages.Wrapped"]:
    """Prepare the quantized front end (calibrated on flattened frames) and
    return (state, jitted forward(frames, centermap))."""
    b, t = calib_frames.shape[:2]
    fe = prepare_int8_frontend(
        variables, calib_frames.reshape(b * t, *calib_frames.shape[2:])
    )

    @jax.jit
    def forward(frames, centermap):
        return int8_video_forward(
            variables,
            fe,
            frames,
            centermap,
            num_classes=num_classes,
            wasp_double_conv2=wasp_double_conv2,
            dtype=dtype,
        )

    return fe, forward
