"""Fused Gaussian-target + MSE loss as Pallas kernels with a custom VJP.

The train step's loss is ``mean((pred - render_targets(kpts))^2)``
(Reference: unipose.py:70,117 MSELoss on Gaussian heatmaps rendered in
utils/lsp_lspet_data.py:224-234).  The default path materializes the target
tensor (B, H, W, K+1) in HBM, reads it back for the loss, and again for the
gradient.  These kernels synthesize the target *inside* the kernel from the
(B, K, 2) keypoints on both the forward and backward passes, so the target
never exists in memory:

  forward : per-batch partial sums of squared error   -> mean
  backward: dL/dpred = 2 * (pred - target) * g / N    (target re-synthesized)

Exact reference semantics preserved: ``int()`` truncation before stride
division, clamp to [0.0099, 1], background channel = 1 - max(joints).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _targets_for_block(kpts, h: int, w: int, stride: int, sigma: float):
    """(K, 2) kpts -> (h, w, K+1) targets, channel 0 = background."""
    centers = jnp.trunc(kpts) / jnp.float32(stride)  # (K, 2) as (x, y)
    # Mosaic requires integer iota; cast after.
    gy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    cx = centers[:, 0][None, None, :]
    cy = centers[:, 1][None, None, :]
    d2 = (gx[..., None] - cx) ** 2 + (gy[..., None] - cy) ** 2
    heat = jnp.exp(-d2 / 2.0 / (sigma * sigma))
    heat = jnp.minimum(heat, 1.0)
    heat = jnp.where(heat < 0.0099, 0.0, heat)  # (h, w, K)
    background = 1.0 - jnp.max(heat, axis=-1, keepdims=True)
    return jnp.concatenate([background, heat], axis=-1)


def _fwd_kernel(pred_ref, kpts_ref, out_ref, *, stride: int, sigma: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0.0

    pred = pred_ref[0].astype(jnp.float32)  # (h, w, K+1)
    h, w, _ = pred.shape
    tgt = _targets_for_block(kpts_ref[0], h, w, stride, sigma)
    diff = pred - tgt
    # TPU grid steps run sequentially; accumulating into the revisited (1,1)
    # SMEM block is the standard reduction pattern.
    out_ref[0, 0] += jnp.sum(diff * diff)


def _bwd_kernel(pred_ref, kpts_ref, g_ref, dpred_ref, *, stride: int, sigma: float):
    pred = pred_ref[0].astype(jnp.float32)
    h, w, _ = pred.shape
    tgt = _targets_for_block(kpts_ref[0], h, w, stride, sigma)
    scale = g_ref[0, 0]  # incoming cotangent * 2/N, premultiplied by caller
    dpred_ref[0] = ((pred - tgt) * scale).astype(dpred_ref.dtype)


def _sq_err_sum(pred, kpts, stride, sigma, interpret):
    b, h, w, c = pred.shape
    kernel = functools.partial(_fwd_kernel, stride=stride, sigma=sigma)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, kpts.shape[1], 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(pred, kpts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def heatmap_mse(
    pred: jnp.ndarray,
    kpts: jnp.ndarray,
    stride: int = 8,
    sigma: float = 3.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """``mean((pred - targets(kpts))^2)`` without materializing targets.

    pred: (B, H/stride, W/stride, K+1) heatmaps; kpts: (B, K, 2) pixel coords
    at input resolution.
    """
    total = _sq_err_sum(pred, jnp.asarray(kpts, jnp.float32), stride, sigma, interpret)
    return total[0, 0] / jnp.float32(pred.size)


def _fwd(pred, kpts, stride, sigma, interpret):
    return heatmap_mse(pred, kpts, stride, sigma, interpret), (pred, kpts)


def _bwd(stride, sigma, interpret, res, g):
    pred, kpts = res
    b, h, w, c = pred.shape
    scale = jnp.reshape(g * 2.0 / pred.size, (1, 1)).astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, stride=stride, sigma=sigma)
    dpred = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, kpts.shape[1], 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(pred.shape, pred.dtype),
        interpret=interpret,
    )(pred, jnp.asarray(kpts, jnp.float32), scale)
    return dpred, None


heatmap_mse.defvjp(_fwd, _bwd)
