"""WASP — Waterfall Atrous Spatial Pooling, NHWC.

Reference: model/modules/wasp.py (image) and model/modules/waspVideo.py
(video) —
  * ``aspp1`` is a 1x1 conv 2048->256; ``aspp2..4`` are 3x3 atrous convs
    256->256 applied in **cascade** (waterfall), dilations [24,18,12,6] at
    output_stride 16 / [48,36,24,12] at 8 (wasp.py:39-49,66-70).
  * every branch output is pushed through the same 1x1 ``conv2`` **twice**
    (wasp.py:72-80) — a quirk in the released code; replicated behind
    ``double_conv2`` because pretrained weights bake it in.
  * global-average-pool branch: GAP -> 1x1 2048->256 -> BN -> ReLU,
    bilinear-upsampled with align_corners to the branch size (wasp.py:51-54,
    82-83).  The video variant omits the BN in this branch
    (waspVideo.py:56-59) — ``gap_batchnorm=False``.
  * concat 5x256 -> 1x1 ``conv1`` -> BN -> ReLU -> Dropout(0.5)
    (wasp.py:59-63,84-90).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.ops.resize import bilinear_resize


class AtrousModule(nn.Module):
    """conv -> BN -> ReLU (Reference: wasp.py:6-20)."""

    features: int
    kernel_size: int
    padding: int
    dilation: int
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = Conv(
            self.features,
            self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            dtype=self.dtype,
            name="atrous_conv",
        )(x)
        x = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn")(
            x, use_running_average=(not train) or self.freeze_bn
        )
        return nn.relu(x)


class _GlobalAvgPool(nn.Module):
    """GAP branch, children named '1'/'2' to mirror nn.Sequential indices
    (Reference: wasp.py:51-54; index 0 is the pooling op, which has no
    parameters)."""

    batchnorm: bool = True
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        x = Conv(256, 1, dtype=self.dtype, name="1")(x)
        if self.batchnorm:
            x = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="2")(
                x, use_running_average=(not train) or self.freeze_bn
            )
        return nn.relu(x)


class WASP(nn.Module):
    output_stride: int = 16
    double_conv2: bool = True
    gap_batchnorm: bool = True  # False reproduces waspVideo.py:56-59
    dropout_rate: float = 0.5
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.output_stride == 16:
            dilations = (24, 18, 12, 6)
        elif self.output_stride == 8:
            dilations = (48, 36, 24, 12)
        else:
            raise NotImplementedError(f"output_stride {self.output_stride}")

        x1 = AtrousModule(256, 1, padding=0, dilation=dilations[0], freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="aspp1")(x, train=train)
        x2 = AtrousModule(256, 3, padding=dilations[1], dilation=dilations[1], freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="aspp2")(x1, train=train)
        x3 = AtrousModule(256, 3, padding=dilations[2], dilation=dilations[2], freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="aspp3")(x2, train=train)
        x4 = AtrousModule(256, 3, padding=dilations[3], dilation=dilations[3], freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="aspp4")(x3, train=train)

        conv2 = Conv(256, 1, dtype=self.dtype, name="conv2")
        branches = [conv2(b) for b in (x1, x2, x3, x4)]
        if self.double_conv2:
            branches = [conv2(b) for b in branches]

        x5 = _GlobalAvgPool(batchnorm=self.gap_batchnorm, freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="global_avg_pool")(x, train=train)
        x5 = bilinear_resize(x5, branches[-1].shape[1:3])

        y = jnp.concatenate([*branches, x5], axis=-1)
        y = Conv(256, 1, dtype=self.dtype, name="conv1")(y)
        y = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn1")(
            y, use_running_average=(not train) or self.freeze_bn
        )
        y = nn.relu(y)
        if train and self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=False)(y)
        return y
