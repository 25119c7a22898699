"""Exact ``align_corners=True`` bilinear resize, implemented as two small
matrix multiplies so it rides the MXU instead of a gather pipeline.

Parity target: ``torch.nn.functional.interpolate(x, size, mode='bilinear',
align_corners=True)`` as used at
Reference: model/modules/wasp.py:83 (1x1 -> 23x23 GAP branch upsample),
model/modules/decoder.py:49 (23x23 -> 46x46), model/unipose.py:32 and
utils/utils.py:478 (46x46 -> 368x368 output upsample).

With ``align_corners=True`` the source coordinate of output index ``o`` is
``o * (in - 1) / (out - 1)`` (0 when ``out == 1``), and each output pixel is a
convex combination of at most two input pixels per axis.  That makes the whole
resize separable:  ``out = R_h @ x @ R_w^T`` with dense interpolation matrices
``R_h (OH, IH)`` and ``R_w (OW, IW)`` built at trace time.  On TPU these are
two tiny matmuls that XLA fuses with neighbouring ops; numerics match torch to
f32 rounding because the weights are the same convex pairs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align-corners interpolation matrix."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        # torch broadcasts the single source pixel (scale factor is 0).
        mat[:, 0] = 1.0
        return mat
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        w_hi = src - lo
        mat[o, lo] += 1.0 - w_hi
        mat[o, hi] += w_hi
    return mat


def resize_matrix(in_size: int, out_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Public accessor for the interpolation matrix (cached per shape)."""
    return jnp.asarray(_resize_matrix_np(in_size, out_size), dtype=dtype)


def bilinear_resize(x: jnp.ndarray, out_hw, *, dtype=None) -> jnp.ndarray:
    """Resize NHWC (or HWC / NTHWC via leading-dim collapse) images.

    Args:
      x: (..., H, W, C) array.
      out_hw: (out_h, out_w) target spatial size.
      dtype: optional accumulation dtype; defaults to ``x.dtype`` (the matmuls
        always accumulate in f32 via ``preferred_element_type``).

    Returns:
      (..., out_h, out_w, C) array in ``x.dtype`` (or ``dtype`` if given).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x if dtype is None else x.astype(dtype)
    out_dtype = dtype or x.dtype
    rh = resize_matrix(in_h, out_h, dtype=x.dtype)
    rw = resize_matrix(in_w, out_w, dtype=x.dtype)
    # (..., H, W, C): contract H then W on the MXU, accumulate in f32.
    y = jnp.einsum("oh,...hwc->...owc", rh, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,...owc->...opc", rw, y, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)
