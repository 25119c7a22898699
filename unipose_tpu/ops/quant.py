"""Int8 quantization primitives for the bandwidth-bound ResNet front end.

Why: the front end (stem + layer1 + layer2) is 58% of backbone time at 13%
of its FLOPs (docs/BENCHMARKS.md) — the high-resolution/low-channel convs are
HBM-bandwidth-bound, not FLOP-bound.  int8 halves activation bytes, and the
v5e MXU runs s8*s8->s32 at twice bf16 peak, so a quantized front end is the
one remaining front-end lever after the s2d-stem and Pallas-stem experiments
both measured at parity/slower.

What this provides (experiment harness: ``scripts/profile_int8.py``):

* eval-mode BN folding (conv + BatchNorm running stats -> conv w/ bias),
* symmetric per-output-channel weight quantization,
* static activation calibration (max-abs at every requantization point,
  recorded by running the f32 path once on representative input),
* a front-end forward that mirrors ``ResNet101`` stem+layer1+layer2 exactly
  (Reference: model/modules/backbone/resnet.py:61-65,77-92 — stem 7x7/2 +
  maxpool, layer1 3 bottlenecks, layer2 4 bottlenecks stride 2), runnable in
  f32/bf16 (calibration / folded baseline) or int8 (quantized path).

Quantization scheme: symmetric, zero-point-free (quantized 0 == real 0, so
conv padding stays correct), activations per-tensor with static calibrated
scales (a dynamic max would add a full-tensor reduction per layer — exactly
the HBM traffic this is trying to remove), weights per-output-channel.
Accumulation in int32 on the MXU; epilogue (scale + bias + ReLU + requant)
in f32, which XLA fuses into the conv.

The accuracy story on real data is parked until checkpoints/datasets exist
(docs/ROADMAP.md); this module is measurement infrastructure plus the
building blocks a real w8a8 deployment would reuse.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unipose_tpu.ops.pooling import max_pool2d

# ----------------------------------------------------------------------------
# Folding and quantization primitives
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class FoldedConv:
    """A conv with its following eval-mode BatchNorm folded in."""

    w: jnp.ndarray  # (kh, kw, cin, cout) f32
    b: jnp.ndarray  # (cout,) f32
    stride: int = 1
    padding: int = 0
    dilation: int = 1


@dataclasses.dataclass
class QuantConv:
    """Int8 twin of a FoldedConv: s8 weights + per-channel dequant scale."""

    w_i8: jnp.ndarray  # (kh, kw, cin, cout) int8
    w_scale: jnp.ndarray  # (cout,) f32: w ~= w_i8 * w_scale
    b: jnp.ndarray  # (cout,) f32
    stride: int = 1
    padding: int = 0
    dilation: int = 1


def fold_bn(
    w: jnp.ndarray,
    bn_params: Dict[str, jnp.ndarray],
    bn_stats: Dict[str, jnp.ndarray],
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    eps: float = 1e-5,
) -> FoldedConv:
    """Fold eval-mode BN (running stats) into the preceding conv.

    y = gamma * (conv(x, w) - mean) / sqrt(var + eps) + beta
      = conv(x, w * s) + (beta - mean * s),   s = gamma / sqrt(var + eps)
    """
    s = bn_params["weight"] * jax.lax.rsqrt(bn_stats["running_var"] + eps)
    return FoldedConv(
        w=(w * s).astype(jnp.float32),
        b=(bn_params["bias"] - bn_stats["running_mean"] * s).astype(jnp.float32),
        stride=stride,
        padding=padding,
        dilation=dilation,
    )


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_conv(fc: FoldedConv) -> QuantConv:
    w_i8, w_scale = quantize_weight(fc.w)
    return QuantConv(
        w_i8=w_i8,
        w_scale=w_scale,
        b=fc.b,
        stride=fc.stride,
        padding=fc.padding,
        dilation=fc.dilation,
    )


def conv_i8(x_i8: jnp.ndarray, qc: QuantConv) -> jnp.ndarray:
    """s8 x s8 -> s32 conv on the MXU (int32 accumulation)."""
    p = qc.padding
    return jax.lax.conv_general_dilated(
        x_i8,
        qc.w_i8,
        window_strides=(qc.stride, qc.stride),
        padding=((p, p), (p, p)),
        rhs_dilation=(qc.dilation, qc.dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# ----------------------------------------------------------------------------
# Front-end graph (stem + layer1 + layer2), shared between modes
# ----------------------------------------------------------------------------

# (layer index, planes, n_blocks, first stride) for the front end.  layer3/4
# are at stride 16 with 256+ channels — already MXU-bound, stay bf16.
_FRONTEND_STAGES = ((1, 64, 3, 1), (2, 128, 4, 2))


def frontend_conv_specs() -> Dict[str, Tuple[int, int]]:
    """name -> (stride, padding) for every conv in the front end."""
    specs: Dict[str, Tuple[int, int]] = {"conv1": (2, 3)}
    for layer, _planes, n_blocks, stride in _FRONTEND_STAGES:
        for i in range(n_blocks):
            s = stride if i == 0 else 1
            specs[f"layer{layer}.{i}.conv1"] = (1, 0)
            specs[f"layer{layer}.{i}.conv2"] = (s, 1)
            specs[f"layer{layer}.{i}.conv3"] = (1, 0)
            if i == 0:
                specs[f"layer{layer}.0.downsample.0"] = (s, 0)
    return specs


def fold_frontend(variables: Dict) -> Dict[str, FoldedConv]:
    """Fold each front-end conv+BN pair out of a ResNet101 variables tree.

    Works on the param-tree layout of ``models/resnet.py`` (torch-keyed:
    ``conv1``/``bn1``, ``layer{L}.{i}.conv{1..3}/bn{1..3}``,
    ``layer{L}.0.downsample.{0,1}``).
    """
    params, stats = variables["params"], variables["batch_stats"]

    def get(tree, dotted):
        for part in dotted.split("."):
            tree = tree[part]
        return tree

    folded: Dict[str, FoldedConv] = {}
    for name, (stride, padding) in frontend_conv_specs().items():
        if name == "conv1":
            bn = "bn1"
        elif name.endswith("downsample.0"):
            bn = name[: -len("0")] + "1"
        else:
            bn = name.replace("conv", "bn")
        folded[name] = fold_bn(
            get(params, name)["weight"],
            get(params, bn),
            get(stats, bn),
            stride=stride,
            padding=padding,
        )
    return folded


# The "quantized-domain value" threaded through the shared graph below is a
# (tensor, scale) pair: (int8, python-float scale) on the int8 path,
# (f32/bf16, 1.0) on the calibration/baseline path.  Scales are static at
# trace time, so the compiled int8 program contains them as constants.
_QVal = Tuple[jnp.ndarray, float]


def _run_frontend(
    x: jnp.ndarray,
    conv: Callable[[str, _QVal], jnp.ndarray],
    requant: Callable[[str, jnp.ndarray], _QVal],
    deq: Callable[[_QVal], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The stem+layer1+layer2 graph, parameterized over the numeric mode.

    ``conv(name, qv)`` maps a quantized-domain value through conv ``name``
    into the real-valued domain (scale + bias applied); ``requant(name, h)``
    maps a real-valued tensor into the quantized domain for point ``name``;
    ``deq(qv)`` maps back to real values (for residual adds / the output).

    Returns (layer2 output, layer1 output) — the latter is ResNet101's
    ``low_level_feat`` (stride 4, 256ch), which the decoder consumes.
    """
    qv = requant("input", x)
    h = jax.nn.relu(conv("conv1", qv))
    q, s = requant("stem", h)
    qv = (max_pool2d(q, 3, 2, 1), s)  # max commutes with the positive scale

    low_level = None
    for layer, _planes, n_blocks, _stride in _FRONTEND_STAGES:
        for i in range(n_blocks):
            blk = f"layer{layer}.{i}"
            h = jax.nn.relu(conv(f"{blk}.conv1", qv))
            q1 = requant(f"{blk}.relu1", h)
            h = jax.nn.relu(conv(f"{blk}.conv2", q1))
            q2 = requant(f"{blk}.relu2", h)
            h = conv(f"{blk}.conv3", q2)
            if i == 0:
                residual = conv(f"layer{layer}.0.downsample.0", qv)
            else:
                residual = deq(qv)
            h = jax.nn.relu(h + residual)
            qv = requant(f"{blk}.out", h)
        if layer == 1:
            low_level = deq(qv)
    return deq(qv), low_level


def frontend_f32(
    folded: Dict[str, FoldedConv],
    x: jnp.ndarray,
    *,
    dtype: jnp.dtype = jnp.float32,
    record: Optional[Dict[str, jnp.ndarray]] = None,
    return_low: bool = False,
) -> jnp.ndarray:
    """Folded-conv front end in f32/bf16.  With ``record`` given, stores the
    max-abs at every requantization point (static calibration pass)."""

    def conv(name, qv):
        fc = folded[name]
        p = fc.padding
        y = jax.lax.conv_general_dilated(
            qv[0].astype(dtype),
            fc.w.astype(dtype),
            window_strides=(fc.stride, fc.stride),
            padding=((p, p), (p, p)),
            rhs_dilation=(fc.dilation, fc.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.astype(jnp.float32) + fc.b

    def requant(name, h):
        if record is not None:
            record[name] = jnp.max(jnp.abs(h))
        return (h.astype(dtype), 1.0)

    out, low = _run_frontend(x, conv, requant, lambda qv: qv[0].astype(jnp.float32))
    return (out, low) if return_low else out


def calibrate_frontend(
    folded: Dict[str, FoldedConv], x: jnp.ndarray
) -> Dict[str, float]:
    """Static per-tensor activation scales from one representative batch."""

    @jax.jit  # one compiled program, not ~60 eager dispatches
    def run(x):
        record: Dict[str, jnp.ndarray] = {}
        frontend_f32(folded, x, record=record)
        return record

    record = jax.device_get(run(x))
    return {k: max(float(v), 1e-12) / 127.0 for k, v in record.items()}


def frontend_int8(
    qconvs: Dict[str, QuantConv],
    act_scales: Dict[str, float],
    x: jnp.ndarray,
    *,
    out_dtype: jnp.dtype = jnp.float32,
    return_low: bool = False,
) -> jnp.ndarray:
    """w8a8 front end: int8 tensors between convs, f32 epilogues."""

    def requant(name, h):
        s = act_scales[name]
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return (q, s)

    def conv(name, qv):
        q, s = qv
        qc = qconvs[name]
        y = conv_i8(q, qc)
        return y.astype(jnp.float32) * (qc.w_scale * s) + qc.b

    def deq(qv):
        return qv[0].astype(jnp.float32) * qv[1]

    out, low = _run_frontend(x, conv, requant, deq)
    out = out.astype(out_dtype)
    return (out, low.astype(out_dtype)) if return_low else out


def quantize_frontend(folded: Dict[str, FoldedConv]) -> Dict[str, QuantConv]:
    return {name: quantize_conv(fc) for name, fc in folded.items()}
