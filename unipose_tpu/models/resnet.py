"""Dilated ResNet-101 backbone with multi-grid layer4, NHWC.

Reference: model/modules/backbone/resnet.py —
  * Bottleneck (1x1 -> 3x3(stride,dil) -> 1x1 x4 + residual) :5-42
  * output_stride 16 => strides [1,2,2,1], dilations [1,1,1,2] :50-53
  * output_stride 8  => strides [1,2,1,1], dilations [1,1,2,4] :54-56
  * layer4 is a multi-grid unit, blocks [1,2,4] * dilation :49,:94-111
  * forward returns (layer4 out @ stride16 x 2048ch,
                     layer1 out @ stride4 x 256ch "low_level_feat") :113-124
  * depth [3, 4, 23, 3] :159

Parameter tree mirrors the torch ``state_dict`` keys: ``conv1``, ``bn1``,
``layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.ops.pooling import max_pool2d


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        use_ra = not train
        out = Conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = TorchBatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=use_ra)
        out = nn.relu(out)
        out = Conv(
            self.planes,
            3,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.dilation,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = TorchBatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=use_ra)
        out = nn.relu(out)
        out = Conv(self.planes * 4, 1, dtype=self.dtype, name="conv3")(out)
        out = TorchBatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=use_ra)

        residual = x
        if self.has_downsample:

            class _Downsample(nn.Module):
                planes: int
                stride: int
                dtype: Optional[jnp.dtype]

                @nn.compact
                def __call__(self, x, *, train: bool):
                    y = Conv(self.planes * 4, 1, stride=self.stride, dtype=self.dtype, name="0")(x)
                    return TorchBatchNorm(dtype=self.dtype, name="1")(
                        y, use_running_average=not train
                    )

            residual = _Downsample(self.planes, self.stride, self.dtype, name="downsample")(
                x, train=train
            )

        return nn.relu(out + residual)


class _Stage(nn.Module):
    """A sequence of bottlenecks named '0'..'n-1' (mirrors nn.Sequential)."""

    planes: int
    strides: Sequence[int]
    dilations: Sequence[int]
    first_downsample: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for i, (s, d) in enumerate(zip(self.strides, self.dilations)):
            x = Bottleneck(
                self.planes,
                stride=s,
                dilation=d,
                has_downsample=(i == 0 and self.first_downsample),
                dtype=self.dtype,
                name=str(i),
            )(x, train=train)
        return x


class ResNet101(nn.Module):
    """Returns (stride-16 features 2048ch, stride-4 low-level features 256ch)."""

    output_stride: int = 16
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    multi_grid: Tuple[int, ...] = (1, 2, 4)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride == 16:
            strides = [1, 2, 2, 1]
            dilations = [1, 1, 1, 2]
        elif self.output_stride == 8:
            strides = [1, 2, 1, 1]
            dilations = [1, 1, 2, 4]
        else:
            raise NotImplementedError(f"output_stride {self.output_stride}")

        x = Conv(64, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, 1)

        def stage(i, planes, n_blocks, name):
            # first block carries the stride; the rest are stride 1
            # (Reference: resnet.py:77-92)
            return _Stage(
                planes,
                strides=[strides[i]] + [1] * (n_blocks - 1),
                dilations=[dilations[i]] * n_blocks,
                first_downsample=True,
                dtype=self.dtype,
                name=name,
            )

        x = stage(0, 64, self.layers[0], "layer1")(x, train=train)
        low_level_feat = x
        x = stage(1, 128, self.layers[1], "layer2")(x, train=train)
        x = stage(2, 256, self.layers[2], "layer3")(x, train=train)
        # layer4: multi-grid dilations blocks[i] * dilation (resnet.py:94-111)
        x = _Stage(
            512,
            strides=[strides[3]] + [1] * (len(self.multi_grid) - 1),
            dilations=[m * dilations[3] for m in self.multi_grid],
            first_downsample=True,
            dtype=self.dtype,
            name="layer4",
        )(x, train=train)
        return x, low_level_feat
