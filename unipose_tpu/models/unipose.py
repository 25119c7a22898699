"""UniPose image model: ResNet-101 -> WASP -> decoder -> (B, H/8, W/8, K+1).

Reference: model/unipose.py —
  * composition :20-22, forward :27-38;
  * output upsampled to input size (align_corners) only when stride != 8
    (:31-32);
  * heatmaps are channel-LAST here (TPU-native); use
    ``unipose_tpu.compat.to_nchw``/``to_nhwc`` at the API edge for
    reference-layout interop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unipose_tpu.core.config import ModelConfig
from unipose_tpu.models.decoder import Decoder
from unipose_tpu.models.resnet import ResNet101
from unipose_tpu.models.wasp import WASP
from unipose_tpu.ops.resize import bilinear_resize


class UniPose(nn.Module):
    """Note on sync-BN: under GSPMD data-parallel training (batch sharded over
    the ``data`` mesh axis inside ``jit``), BatchNorm's ``jnp.mean`` over the
    batch axis is computed globally by XLA-inserted collectives — i.e. the
    reference's ignored ``sync_bn=True`` flag (model/unipose.py:14, SURVEY
    §2.2) becomes real semantics for free.  Per-replica BN would require
    ``shard_map``; ``TorchBatchNorm.axis_name`` exists for that path.
    """

    num_classes: int = 14
    output_stride: int = 16
    stride: int = 8
    wasp_double_conv2: bool = True
    # bbox-head variant (model/unipose.py:34-35, commented upstream): emit 5
    # extra box channels and return (keypoint_maps, box_maps).
    bbox_head: bool = False
    # torch model.freeze_bn() fine-tune mode (Reference: model/unipose.py:24-25,
    # 40-45; broken upstream — isinstance against the undefined name
    # SynchronizedBatchNorm2d raises NameError when invoked): BN uses
    # running stats during training and stats are not updated; BN affine
    # params still receive gradients and dropout is unaffected.
    freeze_bn: bool = False
    # Per-group (ghost) BN statistics (TorchBatchNorm.stat_groups): the
    # trainer derives this from the mesh when ModelConfig.sync_bn=False so
    # BN stats stay local to each data-parallel shard.
    bn_groups: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats, low_level = ResNet101(
            output_stride=self.output_stride,
            freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups,
            dtype=self.dtype,
            name="backbone",
        )(x, train=train)
        y = WASP(
            output_stride=self.output_stride,
            double_conv2=self.wasp_double_conv2,
            freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups,
            dtype=self.dtype,
            name="wasp",
        )(feats, train=train)
        y = Decoder(
            self.num_classes, bbox_head=self.bbox_head,
            freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups, dtype=self.dtype,
            name="decoder",
        )(y, low_level, train=train)
        if self.stride != 8:
            y = bilinear_resize(y, x.shape[1:3])
        # Heatmaps & loss stay in f32 regardless of the compute dtype.
        y = y.astype(jnp.float32)
        if self.bbox_head:
            k = self.num_classes + 1
            return y[..., :k], y[..., k:]
        return y


def build_model(config: ModelConfig, bn_groups: int = 1) -> nn.Module:
    """Factory mirroring the reference constructors (model/unipose.py:9,
    model/uniposeLSTM.py:68).

    ``bn_groups`` realizes ``ModelConfig.sync_bn=False``: BN statistics are
    computed per contiguous batch group instead of globally (per-shard BN —
    the Trainer passes the mesh's data-parallel shard count).  1 = global
    stats, which under GSPMD means synced-across-replicas (sync_bn=True).
    """
    if config.variant == "image":
        return UniPose(
            num_classes=config.num_classes,
            output_stride=config.output_stride,
            stride=config.stride,
            wasp_double_conv2=config.wasp_double_conv2,
            freeze_bn=config.freeze_bn,
            bn_groups=bn_groups,
            dtype=None if config.compute_dtype == jnp.float32 else config.compute_dtype,
        )
    elif config.variant == "lstm":
        from unipose_tpu.models.unipose_lstm import UniPoseLSTM

        return UniPoseLSTM(
            num_classes=config.num_classes,
            output_stride=config.output_stride,
            stride=config.stride,
            wasp_double_conv2=config.wasp_double_conv2,
            remat_scan=config.remat_scan,
            remat_tower=config.remat_tower,
            freeze_bn=config.freeze_bn,
            head_positive_bias=config.head_positive_bias,
            bn_groups=bn_groups,
            spmd_axes=config.spmd_axes,
            dtype=None if config.compute_dtype == jnp.float32 else config.compute_dtype,
        )
    raise ValueError(f"unknown variant {config.variant!r}")


def init_model(
    config: ModelConfig,
    rng: jax.Array,
    sample_batch: int = 1,
    input_size: int = None,
    bn_groups: int = 1,
):
    """Initialize variables for a model; returns (module, variables).

    ``init`` is jitted: eager flax init dispatches every op individually
    (minutes over a remote-device tunnel for a 300-conv network); one
    compiled program initializes in seconds and hits the persistent
    compilation cache.
    """
    model = build_model(config, bn_groups=bn_groups)
    size = input_size or config.spec.input_size
    if config.variant == "lstm":
        frames = jnp.zeros((sample_batch, config.frame_memory, size, size, 3))
        centermap = jnp.zeros((sample_batch, config.frame_memory, size, size, 1))
        init = jax.jit(lambda k, f, c: model.init(k, f, c, train=False))
        variables = init(rng, frames, centermap)
    else:
        dummy = jnp.zeros((sample_batch, size, size, 3))
        init = jax.jit(lambda k, x: model.init(k, x, train=False))
        variables = init(rng, dummy)
    return model, variables
