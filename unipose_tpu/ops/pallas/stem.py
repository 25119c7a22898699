"""Fused ResNet stem as a Pallas kernel — a documented EXPERIMENT.

The stem (7x7/2 conv -> BN -> ReLU -> 3x3/2 maxpool,
Reference: model/modules/backbone/resnet.py:61-65,113-117) is HBM-bound
under XLA: the 184x184x64 conv output makes a full round trip to HBM before
the maxpool reads it back (~340 MB of traffic per batch-32 step for ~0.6
GFLOP/frame of compute).  This kernel keeps the conv activation in VMEM and
writes only the pooled stride-4 tensor — one input read, one output write.

Measured outcome (v5e, batch 32): 5.67 ms vs XLA's 2.33 ms — the saved HBM
traffic does not compensate for the MXU-hostile shapes (per-tap K=12, M=10
matmuls across a 23-step grid).  The linen stem stays the production path;
this kernel is kept, correctness-pinned by tests, as the record of that
measurement and as a starting point if Mosaic gains better small-K fusion.

Implementation notes:
  * input is space-to-depth(2) (184x184x12); the exact 7x7/2 -> 4x4/1 weight
    transform lives in ``models.resnet.s2d_stem_kernel``;
  * grid is (batch, 23 row-chunks): each program computes 4 pool rows from
    10 conv rows (+1 halo each side) entirely in VMEM;
  * the maxpool uses static-slice neighborhood maxes + reshape-based stride-2
    subsampling (Mosaic rejects strided slices on >2D values), with the
    pool's -inf padding injected only at the true top/bottom image borders;
  * eval-mode BN is folded to scale/bias.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unipose_tpu.models.resnet import s2d_stem_kernel, space_to_depth

_POOL_ROWS = 4  # pool rows per grid step (92 = 23 * 4)
_NEG = -1e30  # stands in for -inf padding (finite to keep max math clean)


def fold_stem_params(params: Dict, batch_stats: Dict, eps: float = 1e-5):
    """backbone params/batch_stats subtrees -> folded {w4, scale, bias}.

    Accepts either the standard ``conv1`` (7,7,3,64) or the s2d ``conv1_s2d``
    (4,4,12,64) kernel; output w4 is (16*12, 64), tap-major.
    """
    p = jax.device_get(params)
    st = jax.device_get(batch_stats)
    if "conv1_s2d" in p:
        w4 = np.asarray(p["conv1_s2d"]["weight"], np.float32)
    else:
        w4 = s2d_stem_kernel(np.asarray(p["conv1"]["weight"], np.float32))
    s = p["bn1"]["weight"] / np.sqrt(np.asarray(st["bn1"]["running_var"]) + eps)
    b = p["bn1"]["bias"] - st["bn1"]["running_mean"] * s
    return {
        "w4": w4.reshape(16 * w4.shape[2], w4.shape[3]),
        "scale": np.asarray(s, np.float32),
        "bias": np.asarray(b, np.float32),
    }


def _stem_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *, sp: int):
    """x (1, sp+5, 12, sp+3) channel-in-sublane layout (rows padded 3 lead /
    2 trail); out block (1, _POOL_ROWS, sp//2, 64) per (batch, chunk)
    program.  Keeping the 12 s2d channels OUT of the lane dim avoids the
    12->128 lane-padding VMEM blowup."""
    j = pl.program_id(1)
    cin = x_ref.shape[2]
    n_conv = 2 * _POOL_ROWS + 2  # conv rows incl. pool halo
    half = sp // 2

    # conv rows logical l in [0, n_conv) correspond to image conv rows
    # 8*j - 1 + l; they read x rows [8*j, 8*j + n_conv + 3).
    xs = x_ref[0, pl.ds(8 * j, n_conv + 3)]  # (n_conv+3, cin, sp+3)

    w = w_ref[:]
    c_out = w.shape[-1]
    acc = jnp.zeros((n_conv, sp, c_out), jnp.float32)
    for ti in range(4):
        for tj in range(4):
            shifted = xs[ti : ti + n_conv, :, tj : tj + sp]  # (n_conv, cin, sp)
            tap = w[(ti * 4 + tj) * cin : (ti * 4 + tj + 1) * cin, :]
            acc = acc + jax.lax.dot_general(
                shifted,
                tap,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n_conv, sp, c_out)

    act = jnp.maximum(acc * scale_ref[:] + bias_ref[:], 0.0)
    # -inf rows at the true image borders (pool padding): logical row 0 is
    # conv row -1 only in the first chunk; logical row n_conv-1 is conv row
    # sp only in the last chunk.
    row_id = jax.lax.broadcasted_iota(jnp.int32, (n_conv, sp, c_out), 0)
    act = jnp.where((row_id == 0) & (j == 0), _NEG, act)
    act = jnp.where(
        (row_id == n_conv - 1) & (j == pl.num_programs(1) - 1), _NEG, act
    )

    # 3-row neighborhood max then stride-2 subsample (even offsets only)
    rm = jnp.maximum(
        jnp.maximum(act[0 : n_conv - 2], act[1 : n_conv - 1]), act[2:n_conv]
    )  # (2*_POOL_ROWS, sp, C)
    rsub = rm.reshape(_POOL_ROWS, 2, sp, c_out)[:, 0]  # (_POOL_ROWS, sp, C)

    cpad = jnp.pad(rsub, ((0, 0), (1, 1), (0, 0)), constant_values=_NEG)
    cm = jnp.maximum(
        jnp.maximum(cpad[:, 0:sp], cpad[:, 1 : sp + 1]), cpad[:, 2 : sp + 2]
    )  # (_POOL_ROWS, sp, C)
    out_ref[0] = cm.reshape(_POOL_ROWS, half, 2, c_out)[:, :, 0].astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem(x: jnp.ndarray, folded: Dict[str, jnp.ndarray], *, interpret=False):
    """(B, H, W, 3) -> (B, H/4, W/4, 64): conv7x7/2(pad3) + eval-BN + ReLU +
    maxpool3x3/2(pad1), fused."""
    b, h, w, _ = x.shape
    dtype = x.dtype
    xs = space_to_depth(x, 2)  # (B, H/2, W/2, 12)
    sp = h // 2
    assert (sp // 2) % _POOL_ROWS == 0, "H/4 must be divisible by 4"
    # conv padding (2,1) plus one pool-halo row each side -> rows (3,2);
    # cols keep the conv padding (2,1) (pool col padding is internal).
    xs = jnp.pad(xs, ((0, 0), (3, 2), (2, 1), (0, 0)))
    xs = jnp.transpose(xs, (0, 1, 3, 2))  # channels into the sublane dim
    n_chunks = (sp // 2) // _POOL_ROWS
    kernel = functools.partial(_stem_kernel, sp=sp)
    return pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, sp + 5, xs.shape[2], sp + 3),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _POOL_ROWS, sp // 2, 64),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, sp // 2, sp // 2, 64), dtype),
        interpret=interpret,
    )(xs, jnp.asarray(folded["w4"], dtype),
      jnp.asarray(folded["scale"], jnp.float32),
      jnp.asarray(folded["bias"], jnp.float32))
