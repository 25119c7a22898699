"""Shared building blocks: torch-semantics BatchNorm (with real cross-replica
sync), conv wrappers, and the dtype policy.

Layout: all modules are NHWC with HWIO kernels (TPU-native).  Parameter tree
names intentionally mirror the reference's ``state_dict`` keys (``conv1``,
``bn1``, ``layer1.0.downsample.0`` ...) so ``unipose_tpu.compat`` can convert
checkpoints by key intersection (Reference: unipose.py:79-90).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics.

    * eval: ``(x - running_mean) / sqrt(running_var + eps) * gamma + beta``.
    * train: normalizes with the **biased** batch variance; updates running
      stats with momentum 0.1 using the **unbiased** variance, matching
      ``nn.BatchNorm2d`` (Reference: model/unipose.py:14 — the reference uses
      plain ``nn.BatchNorm2d`` everywhere; its ``sync_bn`` flag is accepted
      and ignored).
    * ``axis_name``: when set (and training), batch moments are averaged
      across that mesh axis with ``lax.pmean`` — the explicit-collective
      sync path for ``shard_map`` contexts (SURVEY §2.2).
    * ``stat_groups``: when > 1 (and training), the leading batch axis is
      split into that many contiguous groups and each group normalizes with
      its OWN statistics — per-shard ("ghost") BatchNorm.  With groups equal
      to the data-parallel shard count and the batch sharded contiguously
      over the mesh (GSPMD's layout), each group's reduction is local to one
      device, so this is exactly what ``sync_bn=False`` means on a
      multi-GPU torch DDP run: BN statistics over the per-device sub-batch
      only, no cross-replica collective.  Running stats update with the
      POOLED global moments (group means averaged; variance pooled about
      the global mean), keeping the replicated EMA state consistent and
      equal in expectation to the synced path.

    Statistics are always computed in f32 regardless of compute dtype.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    stat_groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, use_running_average: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((c,), jnp.float32)
        )

        g = self.stat_groups
        grouped = g > 1 and not use_running_average and not self.is_initializing()
        if grouped:
            if self.axis_name is not None:
                raise ValueError("stat_groups and axis_name are mutually exclusive")
            b = x.shape[0]
            if b % g != 0:
                raise ValueError(
                    f"batch {b} is not divisible by stat_groups={g}"
                )
            xf = x.astype(jnp.float32).reshape((g, b // g) + x.shape[1:])
            reduce_axes = tuple(range(1, xf.ndim - 1))
            mean_g = jnp.mean(xf, axis=reduce_axes)              # (g, C)
            mean_sq_g = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var_g = mean_sq_g - jnp.square(mean_g)  # biased, per group
            bshape = (g,) + (1,) * (xf.ndim - 2) + (c,)
            y = (xf - mean_g.reshape(bshape)) * jax.lax.rsqrt(
                var_g.reshape(bshape) + self.eps
            )
            y = (y * scale + bias).reshape(x.shape)
            # EMA: pooled global moments (identical to the g=1 stats).
            mean = jnp.mean(mean_g, axis=0)
            var = jnp.mean(mean_sq_g, axis=0) - jnp.square(mean)
            n = float(np.prod([x.shape[a] for a in range(x.ndim - 1)]))
            unbiased = var * (n / max(n - 1.0, 1.0))
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased
            return y.astype(self.dtype or x.dtype)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = mean_sq - jnp.square(mean)  # biased, used for normalization
            if not self.is_initializing():
                n = 1.0
                for ax in reduce_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class Conv(nn.Module):
    """2D conv with torch-style explicit padding and HWIO kernels.

    ``features``/``kernel_size``/``stride``/``padding``/``dilation`` follow
    ``nn.Conv2d``.  Weight param is named ``weight`` (HWIO) and bias ``bias``
    to line up with torch key names after transposition.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: int = 1
    padding: Union[int, Tuple[Tuple[int, int], Tuple[int, int]]] = 0
    dilation: int = 1
    use_bias: bool = False
    # Init family.  False (default): He-normal fan_out — the reference's
    # EXPLICIT init for backbone/WASP/decoder convs (resnet.py:126-133,
    # wasp.py:92-103).  True: torch's nn.Conv2d DEFAULT init
    # (kaiming_uniform fan_in with a=sqrt(5) => U(+-1/sqrt(fan_in)), and
    # the same bound for the bias) — what the reference's ConvLSTM cells
    # and 11x11 head get, since it never re-inits them
    # (uniposeLSTM.py:9-64,85-89).  The distinction is LOAD-BEARING for
    # from-scratch video training: He-fan_out weights are ~2.5x larger at
    # the 11x11 head's fan-in, and with the head's final ReLU
    # (uniposeLSTM.py:124) plus zero biases, output channels die at init
    # and stay dead (zero gradient) — measured as joints pinned at exactly
    # 0% PCK (docs/BENCHMARKS.md learning validation).
    torch_default_init: bool = False
    # With torch_default_init: initialize the bias at the POSITIVE bound
    # (+1/sqrt(fan_in)) instead of U(+-bound).  Dead-ReLU-avoidance init
    # for output heads whose final activation is a ReLU over mostly-zero
    # regression targets: a channel whose pre-activation goes negative
    # everywhere receives zero gradient forever, and at 368² video training
    # 1-4 of 14 joint channels die within the first epoch across the whole
    # (lr, sigma, warmup, freeze_bn) recipe grid (docs/BENCHMARKS.md
    # round-5 learning validation).  Starting every channel alive removes
    # the init-time corner of that absorbing state.  Opt-in; changes init
    # only, not the fitted semantics.
    bias_positive: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        in_ch = x.shape[-1]
        if self.torch_default_init:
            # U(+-1/sqrt(fan_in)): variance_scaling uniform draws
            # U(+-sqrt(3*scale/fan)); scale=1/3 gives the torch bound.
            weight_init = nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            )
        else:
            weight_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        kernel = self.param(
            "weight",
            weight_init,
            (*k, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        # No preferred_element_type: the TPU MXU accumulates bf16 operands in
        # f32 internally, and requesting an f32 output breaks the conv VJP
        # dtype matching under a bf16 policy.
        pad = (
            ((self.padding, self.padding), (self.padding, self.padding))
            if isinstance(self.padding, int)
            else tuple(tuple(p) for p in self.padding)
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            if self.torch_default_init:
                fan_in = float(in_ch * k[0] * k[1])
                bound = fan_in**-0.5

                if self.bias_positive:

                    def bias_init(key, shape, dtype=jnp.float32):
                        return jnp.full(shape, bound, dtype)

                else:

                    def bias_init(key, shape, dtype=jnp.float32):
                        return jax.random.uniform(
                            key, shape, dtype, minval=-bound, maxval=bound
                        )

            else:
                bias_init = nn.initializers.zeros
            b = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + b.astype(dtype)
        return y
