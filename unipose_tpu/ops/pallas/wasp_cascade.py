"""Fused WASP waterfall cascade as a single Pallas TPU kernel (eval path).

Reference computation: model/modules/wasp.py:66-90 — aspp1 (1x1, 2048->256)
then three cascaded dilated 3x3 convs, per-branch double ``conv2`` 1x1, a
global-average-pool branch, concat and a final 1x1 — each conv followed by
BatchNorm+ReLU.

Why a kernel: at 23x23 spatial the cascade is nine small sequential matmuls
with HBM round-trips between them under XLA; here the whole waterfall runs
out of VMEM with one input read and one output write per batch element, and
two algebraic simplifications baked in:

  * eval-mode BatchNorm folded into each conv's weights/bias
    (``fold_wasp_params``);
  * the double ``conv2`` application (wasp.py:72-80) is linear-linear with no
    nonlinearity between, so it collapses to ONE 1x1 with ``W2 @ W2``;
  * dilated taps that fall entirely into zero padding are skipped — at
    23x23 with dilations (18, 12, 6) that removes most of the padded-MAC
    waste XLA's implicit-GEMM conv performs.

Training still uses the linen WASP (autodiff through BN batch stats and
dropout); this kernel is the inference fast path, validated against the
linen module in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_scale_bias(params: Dict, stats: Dict, eps: float = 1e-5):
    s = params["weight"] / np.sqrt(np.asarray(stats["running_var"]) + eps)
    b = params["bias"] - stats["running_mean"] * s
    return np.asarray(s, np.float32), np.asarray(b, np.float32)


def fold_wasp_params(
    params: Dict,
    batch_stats: Dict,
    *,
    double_conv2: bool = True,
    gap_batchnorm: bool = True,
) -> Dict[str, np.ndarray]:
    """Fold eval-mode BN into conv weights; collapse the double conv2.

    ``params``/``batch_stats``: the ``wasp`` subtrees of the model variables.
    Returns f32 numpy arrays; cast at call time.
    """
    p = jax.device_get(params)
    st = jax.device_get(batch_stats)

    def fold_conv(conv_w, bn_p, bn_s):
        s, b = _bn_scale_bias(bn_p, bn_s)
        return np.asarray(conv_w, np.float32) * s, b

    out = {}
    w1, b1 = fold_conv(
        p["aspp1"]["atrous_conv"]["weight"][0, 0], p["aspp1"]["bn"], st["aspp1"]["bn"]
    )
    out["w1"], out["b1"] = w1, b1  # (2048, 256)
    for i, name in ((2, "aspp2"), (3, "aspp3"), (4, "aspp4")):
        w, b = fold_conv(
            p[name]["atrous_conv"]["weight"], p[name]["bn"], st[name]["bn"]
        )
        out[f"w{i}"], out[f"b{i}"] = w, b  # (3,3,256,256), (256,)

    w2 = np.asarray(p["conv2"]["weight"][0, 0], np.float32)  # (256, 256)
    out["w2eff"] = w2 @ w2 if double_conv2 else w2

    wg = np.asarray(p["global_avg_pool"]["1"]["weight"][0, 0], np.float32)
    if gap_batchnorm:
        s, b = _bn_scale_bias(
            p["global_avg_pool"]["2"], st["global_avg_pool"]["2"]
        )
        out["wg"], out["bg"] = wg * s, b
    else:
        out["wg"], out["bg"] = wg, np.zeros(wg.shape[1], np.float32)

    wc, bc = fold_conv(p["conv1"]["weight"][0, 0], p["bn1"], st["bn1"])
    out["wc"], out["bc"] = wc, bc  # (1280, 256)
    return out


def _dilated_conv_relu(x, w, b, d: int):
    """(S, S, C) x (3, 3, C, C) dilated conv (padding=d) + bias + ReLU.

    Implemented as 9 statically-shifted full-plane matmuls (zero-padded
    borders); all slices are static so Mosaic lowers them directly.  Taps
    whose shift exceeds the plane (|offset| >= S) contribute nothing and are
    skipped entirely.
    """
    s = x.shape[0]
    c_out = w.shape[-1]
    padded = jnp.pad(x, ((d, d), (d, d), (0, 0)))
    acc = jnp.zeros((s * s, c_out), jnp.float32)
    for ki in range(3):
        for kj in range(3):
            if abs((ki - 1) * d) >= s or abs((kj - 1) * d) >= s:
                continue
            shifted = padded[ki * d : ki * d + s, kj * d : kj * d + s, :]
            acc = acc + jnp.dot(
                shifted.reshape(s * s, -1),
                w[ki, kj],
                preferred_element_type=jnp.float32,
            )
    return jnp.maximum(acc.reshape(s, s, c_out) + b, 0.0)


def _wasp_kernel(
    x_ref,
    w1_ref, b1_ref,
    w2_ref, b2_ref,
    w3_ref, b3_ref,
    w4_ref, b4_ref,
    w2eff_ref,
    wg_ref, bg_ref,
    wc_ref, bc_ref,
    out_ref,
    *,
    dilations: Tuple[int, int, int],
):
    x = x_ref[0]  # (S, S, 2048)
    s = x.shape[0]
    dtype = x.dtype
    xs = x.reshape(s * s, -1)

    x1 = jnp.maximum(
        jnp.dot(xs, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:],
        0.0,
    )
    x1 = x1.astype(dtype).reshape(s, s, -1)
    x2 = _dilated_conv_relu(x1, w2_ref[:], b2_ref[:], dilations[0]).astype(dtype)
    x3 = _dilated_conv_relu(x2, w3_ref[:], b3_ref[:], dilations[1]).astype(dtype)
    x4 = _dilated_conv_relu(x3, w4_ref[:], b4_ref[:], dilations[2]).astype(dtype)

    w2eff = w2eff_ref[:]
    branches = [
        jnp.dot(t.reshape(s * s, -1), w2eff, preferred_element_type=jnp.float32)
        .astype(dtype)
        for t in (x1, x2, x3, x4)
    ]

    gap = jnp.mean(xs.astype(jnp.float32), axis=0, keepdims=True)  # (1, 2048)
    x5 = jnp.maximum(
        jnp.dot(gap.astype(dtype), wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:],
        0.0,
    ).astype(dtype)
    x5 = jnp.broadcast_to(x5, (s * s, x5.shape[-1]))

    cat = jnp.concatenate([*branches, x5], axis=-1)  # (S*S, 1280)
    y = jnp.maximum(
        jnp.dot(cat, wc_ref[:], preferred_element_type=jnp.float32) + bc_ref[:],
        0.0,
    )
    out_ref[0] = y.reshape(s, s, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilations", "interpret"))
def wasp_cascade(
    x: jnp.ndarray,
    folded: Dict[str, jnp.ndarray],
    *,
    dilations: Tuple[int, int, int] = (18, 12, 6),
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused WASP eval forward: (B, S, S, 2048) -> (B, S, S, 256).

    ``folded``: output of :func:`fold_wasp_params` (f32 leaves; weights are
    cast to ``x.dtype`` for the MXU, biases stay f32).
    """
    b, s, _, _ = x.shape
    dtype = x.dtype
    wf = lambda k: jnp.asarray(folded[k], dtype)  # noqa: E731
    bf = lambda k: jnp.asarray(folded[k], jnp.float32)  # noqa: E731

    args = (
        x,
        wf("w1"), bf("b1"),
        wf("w2"), bf("b2"),
        wf("w3"), bf("b3"),
        wf("w4"), bf("b4"),
        wf("w2eff"),
        wf("wg"), bf("bg"),
        wf("wc"), bf("bc"),
    )

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(13)]
    kernel = functools.partial(_wasp_kernel, dilations=dilations)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, s, s, x.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, s, s, 256), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, s, 256), dtype),
        interpret=interpret,
    )(*args)
