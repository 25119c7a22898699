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

import numpy as np

from unipose_tpu.models.layers import Conv, TorchBatchNorm
from unipose_tpu.ops.pooling import max_pool2d


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def s2d_stem_kernel(w7: np.ndarray) -> np.ndarray:
    """Transform the 7x7/2 stem kernel (7, 7, 3, 64 HWIO) into the exact
    equivalent 4x4 stride-1 kernel (4, 4, 12, 64) on space-to-depth(2) input.

    Derivation: the stride-2 conv tap at offset u in [-3, 3] maps to s2d tap
    (ti, dy) with u = 2*ti + dy - 4 under leading padding 2, i.e.
    ``w4[ti, tj, (dy, dx, c)] = w7[2ti+dy-1, 2tj+dx-1, c]`` where
    out-of-range rows/cols are zero.  Verified bit-exact in tests.
    """
    w7 = np.asarray(w7)
    cin, cout = w7.shape[2], w7.shape[3]
    w4 = np.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for ti in range(4):
        for tj in range(4):
            for dy in range(2):
                for dx in range(2):
                    u, v = 2 * ti + dy - 1, 2 * tj + dx - 1
                    if 0 <= u < 7 and 0 <= v < 7:
                        w4[ti, tj, (dy * 2 + dx) * cin : (dy * 2 + dx + 1) * cin] = (
                            w7[u, v]
                        )
    return w4


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        use_ra = (not train) or self.freeze_bn
        out = Conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn1")(out, use_running_average=use_ra)
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
        out = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn2")(out, use_running_average=use_ra)
        out = nn.relu(out)
        out = Conv(self.planes * 4, 1, dtype=self.dtype, name="conv3")(out)
        out = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn3")(out, use_running_average=use_ra)

        residual = x
        if self.has_downsample:

            class _Downsample(nn.Module):
                planes: int
                stride: int
                bn_groups: int
                dtype: Optional[jnp.dtype]

                @nn.compact
                def __call__(self, x, *, use_ra: bool):
                    y = Conv(self.planes * 4, 1, stride=self.stride, dtype=self.dtype, name="0")(x)
                    return TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="1")(
                        y, use_running_average=use_ra
                    )

            residual = _Downsample(
                self.planes, self.stride, self.bn_groups, self.dtype, name="downsample"
            )(x, use_ra=use_ra)

        return nn.relu(out + residual)


class _Stage(nn.Module):
    """A sequence of bottlenecks named '0'..'n-1' (mirrors nn.Sequential)."""

    planes: int
    strides: Sequence[int]
    dilations: Sequence[int]
    first_downsample: bool
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    # Segmented rematerialization: checkpoint each bottleneck, so the
    # backward pass saves only block-boundary activations and recomputes one
    # block at a time.  This is the granularity that actually cuts peak
    # memory — rematting the whole backbone as one block recomputes (and
    # holds) every activation at once, saving almost nothing (measured:
    # docs/BENCHMARKS.md remat study).  Training only; eval is unaffected.
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for i, (s, d) in enumerate(zip(self.strides, self.dilations)):
            block = Bottleneck(
                self.planes,
                stride=s,
                dilation=d,
                has_downsample=(i == 0 and self.first_downsample),
                freeze_bn=self.freeze_bn,
                bn_groups=self.bn_groups,
                dtype=self.dtype,
                name=str(i),
            )
            if self.remat and train:
                # prevent_cse=True is load-bearing: CSE would merge the
                # recomputation back into the forward, resurrecting the
                # saved buffers.
                x = nn.remat(
                    lambda mdl, h: mdl(h, train=True), prevent_cse=True
                )(block, x)
            else:
                x = block(x, train=train)
        return x


class ResNet101(nn.Module):
    """Returns (stride-16 features 2048ch, stride-4 low-level features 256ch)."""

    output_stride: int = 16
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    multi_grid: Tuple[int, ...] = (1, 2, 4)
    stem_s2d: bool = False  # exact space-to-depth rewrite of the 7x7/2 stem
    # torch model.freeze_bn() semantics (Reference: model/unipose.py:40-45,
    # broken upstream): BN uses running stats during training, stats are not
    # updated; affine params still train, dropout unaffected.
    freeze_bn: bool = False
    bn_groups: int = 1  # per-group (ghost) BN statistics; see TorchBatchNorm.stat_groups
    # Per-bottleneck gradient checkpointing (see _Stage.remat): long-rollout
    # video BPTT memory knob, training only.
    remat_blocks: bool = False
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

        if self.stem_s2d:
            # bit-equivalent to conv 7x7/2 pad 3 (see s2d_stem_kernel), but
            # with a 12-channel contraction the MXU maps far better than a
            # 3-channel one.
            x = space_to_depth(x, 2)
            x = Conv(
                64, 4, stride=1, padding=((2, 1), (2, 1)),
                dtype=self.dtype, name="conv1_s2d",
            )(x)
        else:
            x = Conv(64, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(stat_groups=self.bn_groups, dtype=self.dtype, name="bn1")(
            x, use_running_average=(not train) or self.freeze_bn
        )
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
                freeze_bn=self.freeze_bn,
                bn_groups=self.bn_groups,
                remat=self.remat_blocks,
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
            freeze_bn=self.freeze_bn,
                bn_groups=self.bn_groups,
            remat=self.remat_blocks,
            dtype=self.dtype,
            name="layer4",
        )(x, train=train)
        return x, low_level_feat
