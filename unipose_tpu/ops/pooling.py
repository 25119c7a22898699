"""Pooling ops with exact torch semantics, on NHWC arrays.

Parity targets:
  * ``nn.MaxPool2d(kernel_size=3, stride=2, padding=1)`` — ResNet stem
    (Reference: model/modules/backbone/resnet.py:65) and the decoder's
    low-level-feature downsample (Reference: model/modules/decoder.py:33,47).
  * ``nn.AvgPool2d(kernel_size=9, stride=8, padding=1)`` — centermap pooling
    (Reference: model/unipose.py:18, model/uniposeLSTM.py:75,91).  Torch's
    default ``count_include_pad=True`` divides by the full window area (81)
    even at the borders; we reproduce that by zero-padding and dividing by
    the constant window size.
"""

from __future__ import annotations

import numpy as np
import jax.lax as lax
import jax.numpy as jnp


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """NHWC max pool, torch output-size convention floor((H+2p-k)/s)+1."""
    # NOTE: init must be a concrete scalar of the operand dtype (np scalar for
    # ints) — a jnp array here silently demotes reduce_window from the
    # reduce_window_max monoid (which has the autodiff rule) to the generic
    # variadic primitive, which fails under reverse-mode AD.
    neg = (
        -jnp.inf
        if jnp.issubdtype(x.dtype, jnp.floating)
        else np.iinfo(np.dtype(x.dtype)).min
    )
    return lax.reduce_window(
        x,
        np.asarray(neg, x.dtype)[()],
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(
    x: jnp.ndarray,
    kernel: int,
    stride: int,
    padding: int,
    *,
    count_include_pad: bool = True,
) -> jnp.ndarray:
    """NHWC average pool matching ``nn.AvgPool2d`` defaults."""
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        return summed / np.asarray(kernel * kernel, dtype=summed.dtype)
    counts = lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None],
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return summed / counts
