"""Configuration layer: dataset specs, model/train configs, and the five
BASELINE presets.

The reference scatters this information across hardcoded trainer attributes
(Reference: unipose.py:46-61, uniposeLSTM.py:48-61), per-dataset loader
constants (utils/lsp_lspet_data.py:205, utils/bbc_data.py:82-83,
utils/penn_action_data.py:30-31) and argparse flags that are then overridden
in-place (unipose.py:261-267). Here it is a single typed surface with no
hidden overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dataset specifications
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static description of one supported dataset.

    ``swap_pairs`` are the horizontal-flip joint exchanges
    (Reference: utils/Mytransforms.py:513 (LSP), :533 (BBC), :554 (NTID)).
    ``joint_names`` follow the per-joint report printer
    (Reference: utils/utils.py:354-473).
    """

    name: str
    num_joints: int
    sigma: float = 3.0
    stride: int = 8
    input_size: int = 368
    is_video: bool = False
    frame_memory: int = 1
    swap_pairs: Tuple[Tuple[int, int], ...] = ()
    joint_names: Tuple[str, ...] = ()

    @property
    def num_channels(self) -> int:
        """Heatmap channels = joints + 1 background channel
        (Reference: utils/lsp_lspet_data.py:224,234)."""
        return self.num_joints + 1

    @property
    def heatmap_size(self) -> int:
        return self.input_size // self.stride


LSP = DatasetSpec(
    name="LSP",
    num_joints=14,
    sigma=3.0,
    swap_pairs=((0, 5), (1, 4), (2, 3), (6, 11), (7, 10), (8, 9)),
    joint_names=(
        "Right Ankle", "Right Knee", "Right Hip", "Left Hip", "Left Knee",
        "Left Ankle", "Right Wrist", "Right Elbow", "Right Shoulder",
        "Left Shoulder", "Left Elbow", "Left Wrist", "Neck", "Head Top",
    ),
)

MPII = DatasetSpec(
    name="MPII",
    num_joints=16,
    sigma=3.0,
    joint_names=(
        "Right Ankle", "Right Knee", "Right Hip", "Left Hip", "Left Knee",
        "Left Ankle", "Pelvis", "Thorax", "Upper Neck", "Head Top",
        "Right Wrist", "Right Elbow", "Right Shoulder", "Left Shoulder",
        "Left Elbow", "Left Wrist",
    ),
)

PENN_ACTION = DatasetSpec(
    name="Penn_Action",
    num_joints=13,
    sigma=1.0,
    is_video=True,
    frame_memory=5,
    joint_names=(
        "Head", "Right Shoulder", "Left Shoulder", "Right Elbow",
        "Left Elbow", "Right Wrist", "Left Wrist", "Right Hip", "Left Hip",
        "Right Knee", "Left Knee", "Right Ankle", "Left Ankle",
    ),
)

BBC = DatasetSpec(
    name="BBC",
    num_joints=7,
    sigma=1.0,
    is_video=True,
    frame_memory=5,
    swap_pairs=((1, 2), (3, 4), (5, 6)),
    joint_names=(
        "Head", "Left Hand", "Right Hand", "Left Elbow", "Right Elbow",
        "Left Shoulder", "Right Shoulder",
    ),
)

NTID = DatasetSpec(
    name="NTID",
    num_joints=19,
    sigma=3.0,
    # The reference's NTID flip reuses the LSP swap pairs
    # (Mytransforms.py:616-639 via RandomHorizontalFlip_NTID).
    swap_pairs=((0, 5), (1, 4), (2, 3), (6, 11), (7, 10), (8, 9)),
    joint_names=(
        "Spine Base", "Spine Mid", "Neck", "Head",
        "Shoulder Left", "Elbow Left", "Wrist Left", "Hand Tip Left",
        "Shoulder Right", "Elbow Right", "Wrist Right", "Hand Tip Right",
        "Hip Left", "Hip Right", "Spine Shoulder",
        "Hand Left", "Thumb Left", "Hand Right", "Thumb Right",
    ),  # per-joint printer (Reference: utils/utils.py:429-459)
)

POSETRACK = DatasetSpec(
    name="PoseTrack",
    num_joints=17,
    sigma=3.0,
    swap_pairs=((3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16)),
    joint_names=(
        "Nose", "Head Bottom", "Head Top", "Left Ear", "Right Ear",
        "Left Shoulder", "Right Shoulder", "Left Elbow", "Right Elbow",
        "Left Wrist", "Right Wrist", "Left Hip", "Right Hip",
        "Left Knee", "Right Knee", "Left Ankle", "Right Ankle",
    ),  # public PoseTrack18 order; matches evaluate.py's norm indices
)

DATASETS = {d.name: d for d in (LSP, MPII, PENN_ACTION, BBC, NTID, POSETRACK)}


# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters.

    Defaults mirror the reference model constructors
    (Reference: model/unipose.py:9-10, model/uniposeLSTM.py:68-69).
    """

    dataset: str = "LSP"
    num_classes: int = 14
    backbone: str = "resnet101"
    output_stride: int = 16
    stride: int = 8
    variant: str = "image"  # "image" | "lstm"
    # Cross-replica BatchNorm.  The reference accepts this flag and ignores
    # it (model/unipose.py:14, SURVEY §2.2); here BOTH settings are real:
    # True (default) = statistics over the global sharded batch (automatic
    # under GSPMD, exact — tests/test_sync_bn.py); False = per-shard
    # statistics (the Trainer builds the model with one BN stat group per
    # data-parallel shard — TorchBatchNorm.stat_groups; torch-DDP-without-
    # SyncBN semantics, sometimes wanted as ghost-batch regularization).
    sync_bn: bool = True
    # Fine-tune with BN frozen to running stats (the reference accepts this
    # flag but its freeze_bn() crashes on an undefined name upstream —
    # model/unipose.py:24-25,:40-45; here it works, and saves the BN-train
    # stat/backward traffic: ~12 ms/step at batch 32 on v5e, BENCHMARKS.md).
    freeze_bn: bool = False
    # Video variant: initialize the 11x11 head's conv biases at the
    # POSITIVE torch bound (+1/sqrt(fan_in)) instead of U(+-bound), so
    # every output-ReLU channel starts alive.  Opt-in mitigation for the
    # dead-channel trap measured at 368² from-scratch/warm-start video
    # training (Conv.bias_positive / docs/BENCHMARKS.md round-5).
    head_positive_bias: bool = False
    # dtype policy: params always f32; compute optionally bf16; BN stats f32.
    compute_dtype: jnp.dtype = jnp.float32
    # Replicate the reference's double application of wasp.conv2
    # (Reference: model/modules/wasp.py:72-80) for pretrained-weight parity.
    wasp_double_conv2: bool = True
    # Video variant only: number of ConvLSTM rollout frames.
    frame_memory: int = 5
    # Rematerialize the scan body under autodiff.  Saves only the small
    # per-step cell activations and costs ~7x compile time (measured: 86 s
    # vs >10 min at T=5) — remat_tower is the effective knob; this one is
    # kept for completeness.
    remat_scan: bool = False
    # Segmented gradient checkpointing of the per-frame backbone (each
    # bottleneck its own remat block): the backbone activations — not the
    # scan carry — are what scales with rollout length.  Measured on v5e at
    # T=20: 2.1x less peak HBM for ~15% step time; granularity is essential
    # (one whole-backbone remat block saves almost nothing: the recompute
    # re-materializes every activation at once) — docs/BENCHMARKS.md.
    remat_tower: bool = False
    # Video variant only — sequence/context parallelism (SURVEY §5.7): mesh
    # axis names (data_axis, time_axis).  When set, the per-frame tower +
    # head shard over BOTH axes (frames of one clip spread across chips)
    # while the tiny ConvLSTM scan runs replicated on all-gathered features.
    # Steps must be traced under ``jax.set_mesh`` (parallel/cp.py).
    spmd_axes: Optional[Tuple[Optional[str], Optional[str]]] = None

    @property
    def spec(self) -> DatasetSpec:
        return DATASETS[self.dataset]

    def with_dtype(self, dtype) -> "ModelConfig":
        return dataclasses.replace(self, compute_dtype=dtype)


# ---------------------------------------------------------------------------
# Train config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (Reference: unipose.py:46-56, uniposeLSTM.py:48-56)."""

    batch_size: int = 8
    lr: float = 1e-4
    gamma: float = 0.333
    step_size: int = 13275
    epochs: int = 100
    workers: int = 1
    # Target-rendering overrides.  ``None`` (default) means "use the dataset
    # spec's value" (DatasetSpec.sigma/stride); setting them overrides what
    # reaches the device-side Gaussian renderer (see ``effective_spec``).
    sigma: Optional[float] = None
    stride: Optional[int] = None
    seed: int = 0
    # Linear LR warmup over the first N steps (0 = off, the reference
    # semantics).  NOTE: measured NOT to rescue the video head's
    # output-ReLU dead-channel trap — a slow ramp lets the uniform
    # background down-push floor the head before the target pull can dig
    # channels out (docs/BENCHMARKS.md round-5 learning validation; target
    # sigma is the knob that works there).  Kept as a standard opt-in
    # schedule feature.
    warmup_steps: int = 0
    # TPU-native additions (no reference equivalent):
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    donate_state: bool = True
    checkpoint_dir: Optional[str] = None
    model_name: str = "unipose"
    # Validation forward batch size.  The reference runs val at batch 1
    # (unipose.py:64); metric *semantics* stay per-frame regardless (the
    # Trainer computes metrics per sample), so batching the forward is pure
    # throughput.  1 reproduces the reference loop shape exactly.
    val_batch_size: int = 8


def effective_spec(spec: DatasetSpec, train: TrainConfig) -> DatasetSpec:
    """Resolve the one source of truth for target rendering: the dataset
    spec, with TrainConfig.sigma/stride applied when set.  Everything
    downstream (loaders, train/eval steps) must consume the returned spec,
    never TrainConfig.sigma/stride directly."""
    overrides = {}
    if train.sigma is not None:
        overrides["sigma"] = float(train.sigma)
    if train.stride is not None:
        overrides["stride"] = int(train.stride)
    return dataclasses.replace(spec, **overrides) if overrides else spec


# ---------------------------------------------------------------------------
# The five BASELINE.json presets
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    description: str
    model: ModelConfig
    train: TrainConfig


PRESETS = {
    # 1. UniPose ResNet-101+WASP single-image inference on LSP
    "lsp_infer": Preset(
        name="lsp_infer",
        description="UniPose single-image inference on LSP (368x368, batch 1, 14 joints)",
        model=ModelConfig(dataset="LSP", num_classes=14),
        train=TrainConfig(batch_size=1, sigma=3.0),
    ),
    # 2. MPII single-person training recipe
    "mpii_train": Preset(
        name="mpii_train",
        description="MPII single-person training (16 joints, Gaussian targets, aug)",
        model=ModelConfig(dataset="MPII", num_classes=16),
        train=TrainConfig(batch_size=8, sigma=3.0, model_name="unipose_mpii"),
    ),
    # 3. UniPose-LSTM on Penn Action
    "penn_lstm": Preset(
        name="penn_lstm",
        description="UniPose-LSTM on Penn Action (5-frame ConvLSTM rollout)",
        model=ModelConfig(
            dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=5
        ),
        train=TrainConfig(batch_size=1, sigma=1.0, model_name="uniposeLSTM_penn"),
    ),
    # 4. BBC Pose video eval
    "bbc_lstm": Preset(
        name="bbc_lstm",
        description="BBC Pose video eval (7 joints, long sequences through the LSTM scan)",
        model=ModelConfig(
            dataset="BBC", num_classes=7, variant="lstm", frame_memory=5,
            # No remat by default: at T=5 the step fits easily (~2 GiB temp),
            # long-video EVAL streams in chunks without BPTT (eval/video.py),
            # and remat_scan costs ~10x compile for nothing (it checkpoints
            # the tiny cell, not the memory sink).  For long-rollout BPTT
            # (T>~40) set remat_tower=True — segmented backbone checkpointing,
            # measured 2.1x less peak HBM at T=20 for ~15% step time
            # (docs/BENCHMARKS.md remat study).
        ),
        train=TrainConfig(batch_size=1, sigma=1.0, model_name="uniposeLSTM_bbc"),
    ),
    # 5. Batched multi-clip GSPMD training
    "multichip_video": Preset(
        name="multichip_video",
        description="Multi-clip video training, GSPMD data-parallel, bf16",
        model=ModelConfig(
            dataset="Penn_Action",
            num_classes=13,
            variant="lstm",
            frame_memory=5,
            sync_bn=True,
            compute_dtype=jnp.bfloat16,
        ),
        train=TrainConfig(
            batch_size=32,
            sigma=1.0,
            mesh_shape=(-1,),
            model_name="uniposeLSTM_multichip",
        ),
    ),
}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"Unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None


def load_yaml_config(path: str) -> Preset:
    """YAML -> (ModelConfig, TrainConfig) preset.

    Successor of the reference's unused ``Config`` YAML->EasyDict helper
    (utils/utils.py:58-64), but typed: top-level keys ``preset`` (optional
    base), ``model`` and ``train`` override preset fields.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    base = get_preset(raw["preset"]) if "preset" in raw else PRESETS["lsp_infer"]
    model = dataclasses.replace(base.model, **raw.get("model", {}))
    train = dataclasses.replace(base.train, **raw.get("train", {}))
    return Preset(
        name=raw.get("name", base.name),
        description=raw.get("description", base.description),
        model=model,
        train=train,
    )
