"""Decoder / heatmap head, NHWC.

Reference: model/modules/decoder.py —
  * low-level features (stride-4, 256ch) -> 1x1 -> 48ch + BN + ReLU
    (:17-19,:39-41), then 3x3/2 maxpool to stride 8 (:33,:47);
  * WASP output bilinear-upsampled (align_corners) to the pooled low-level
    size (:49), concat -> 304ch (:51);
  * head: [3x3 256 + BN + ReLU + Dropout(0.5), 3x3 256 + BN + ReLU +
    Dropout(0.1), 1x1 -> num_classes+1] (:22-30).

The unused ``conv2/bn2`` pair (decoder.py:20-21, dead code at :43-45) is
intentionally not reproduced; the compat converter skips those keys.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.ops.pooling import max_pool2d
from unipose_tpu.ops.resize import bilinear_resize


class _LastConv(nn.Module):
    """Children named by their nn.Sequential indices (decoder.py:22-30):
    0: conv3x3-256, 1: BN, 4: conv3x3-256, 5: BN, 8: conv1x1 out."""

    out_channels: int
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        use_ra = (not train) or self.freeze_bn
        x = Conv(256, 3, padding=1, dtype=self.dtype, name="0")(x)
        x = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="1")(x, use_running_average=use_ra)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.5, deterministic=False)(x)
        x = Conv(256, 3, padding=1, dtype=self.dtype, name="4")(x)
        x = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="5")(x, use_running_average=use_ra)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.1, deterministic=False)(x)
        return Conv(self.out_channels, 1, use_bias=True, dtype=self.dtype, name="8")(x)


class Decoder(nn.Module):
    num_classes: int
    # +5 bounding-box channels (center + 4 corners): the reference's
    # commented-out variant (decoder.py:31 ``num_classes+5+1``), consumed by
    # unipose_tpu.postproc.multi_person.
    bbox_head: bool = False
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, low_level_feat: jnp.ndarray, *, train: bool
    ) -> jnp.ndarray:
        llf = Conv(48, 1, dtype=self.dtype, name="conv1")(low_level_feat)
        llf = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn1")(
            llf, use_running_average=(not train) or self.freeze_bn
        )
        llf = nn.relu(llf)
        llf = max_pool2d(llf, 3, 2, 1)

        x = bilinear_resize(x, llf.shape[1:3])
        x = jnp.concatenate([x, llf], axis=-1)
        out_ch = self.num_classes + 1 + (5 if self.bbox_head else 0)
        return _LastConv(
            out_ch, freeze_bn=self.freeze_bn, bn_groups=self.bn_groups, dtype=self.dtype, name="last_conv"
        )(x, train=train)
