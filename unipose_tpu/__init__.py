"""unipose_tpu — a TPU-native (JAX/XLA/Pallas) re-build of UniPose (CVPR 2020).

Capability parity target: bmartacho/UniPose (reference mounted at /root/reference),
re-designed TPU-first:

* models/   — ResNet-101 (dilated, multi-grid layer4) + WASP waterfall module +
              decoder heatmap head, and the UniPose-LSTM video variant whose
              per-frame ConvLSTM recurrence is a ``jax.lax.scan``.
* ops/      — exact ``align_corners=True`` bilinear resize (as MXU matmuls),
              torch-semantics pooling, batched device-side Gaussian heatmap
              target generation, fused Pallas kernels for the hot paths.
* data/     — LSP/LSPET, MPII, Penn Action and BBC Pose loaders reading the
              same on-disk formats as the reference, with joint-aware
              augmentation (resize / rotate / crop / h-flip with per-skeleton
              swap pairs).
* train/    — jit/pjit train + eval steps (bf16 compute, f32 statistics),
              Adam + step decay, Orbax checkpointing with a ``*_best`` pointer.
* eval/     — PCK / PCKh / AP metrics with the reference's exact argmax and
              normalization semantics, plus the per-joint report printer.
* parallel/ — device-mesh construction and GSPMD sharding (data-parallel
              batches, cross-replica BatchNorm via ``lax.pmean``).
* compat/   — PyTorch checkpoint -> JAX pytree converter (key-intersection
              load semantics, OIHW->HWIO transposes, BN running stats).

Reference call map is documented per-module; see each docstring's
``Reference:`` lines for file:line citations into /root/reference.
"""

__version__ = "0.1.0"

from unipose_tpu.core.config import (  # noqa: F401
    DatasetSpec,
    ModelConfig,
    TrainConfig,
    get_preset,
    PRESETS,
)
