"""UniPose-LSTM video model: per-frame UniPose features + ConvLSTM temporal
recurrence, restructured TPU-first.

Reference: model/uniposeLSTM.py —
  * LSTM_0 (first frame, no incoming state): ``cell = tanh(g*i)``,
    ``hide = o*cell`` with g/i/o from 3x3 convs on the input (:9-24);
  * LSTM (subsequent frames): 4-gate ConvLSTM, per-gate x-conv + h-conv,
    ``cell = f*prevCell + i*g``, ``hide = o*tanh(cell)`` (:27-64);
  * per frame: backbone -> wasp -> decoder (K+1 ch @46x46), centermap
    avg-pooled 9x9/8 to 46x46, concat -> K+2 ch (:108-116);
  * head: three 11x11 convs (->128), then 1x1 128->128 and 1x1 ->K+1, every
    layer ReLU'd (:85-89,:120-124).

TPU restructuring (SURVEY §3.4, §5.7): the reference runs the whole tower
sequentially once per frame inside a Python loop (uniposeLSTM.py:124-128).
Frame features do not depend on the recurrent carry, so here the
backbone/wasp/decoder run **batched over B*T frames** (one big MXU-friendly
batch), and only the cheap ConvLSTM cell is scanned over time with
``jax.lax.scan``.  The 11x11 head depends only on each frame's hidden state,
so it also runs batched over B*T after the scan.  ``jax.checkpoint`` over the
scan body keeps long BBC rollouts within memory.

Channel counts generalize the reference's hardcoded 14/15 (which only fit
Penn Action; BBC crashes upstream): lstm width = num_classes + 2, head out =
num_classes + 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jax.sharding import PartitionSpec as P

from unipose_tpu.models.decoder import Decoder
from unipose_tpu.models.layers import Conv
from unipose_tpu.models.resnet import ResNet101
from unipose_tpu.models.wasp import WASP
from unipose_tpu.ops.pooling import avg_pool2d


class ConvLSTM0(nn.Module):
    """First-frame cell (Reference: uniposeLSTM.py:9-24)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conv = lambda name: Conv(  # noqa: E731
            self.features, 3, padding=1, use_bias=True, torch_default_init=True, dtype=self.dtype, name=name
        )
        # f32 gate math / f32 state, matching ConvLSTMCell's carry dtype.
        g = jnp.tanh(conv("conv_g_lstm")(x).astype(jnp.float32))
        i = jax.nn.sigmoid(conv("conv_i_lstm")(x).astype(jnp.float32))
        o = jax.nn.sigmoid(conv("conv_o_lstm")(x).astype(jnp.float32))
        cell = jnp.tanh(g * i)
        hide = o * cell
        return cell, hide


class ConvLSTMCell(nn.Module):
    """Recurrent cell (Reference: uniposeLSTM.py:27-64).

    The four x-convolutions (and the four h-convolutions) are fused into one
    conv producing 4*features channels — one MXU pass instead of four — then
    split per gate.  Gate order (g, i, o, f) is fixed so the compat converter
    can pack reference per-gate weights into the fused kernel.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        prev_cell, prev_hide = carry
        xg = Conv(4 * self.features, 3, padding=1, use_bias=True, torch_default_init=True, dtype=self.dtype, name="conv_x_gates")(x)
        hg = Conv(4 * self.features, 3, padding=1, use_bias=True, torch_default_init=True, dtype=self.dtype, name="conv_h_gates")(
            prev_hide.astype(x.dtype)
        )
        # Gate math and the cell carry run in f32 even under a bf16 compute
        # policy — the recurrent accumulation otherwise drifts over long
        # rollouts (SURVEY §7.3 hard-part 4).
        gates = (xg + hg).astype(jnp.float32)
        g, i, o, f = jnp.split(gates, 4, axis=-1)
        gt = jnp.tanh(g)
        it = jax.nn.sigmoid(i)
        ot = jax.nn.sigmoid(o)
        ft = jax.nn.sigmoid(f)
        cell = ft * prev_cell.astype(jnp.float32) + it * gt
        hide = ot * jnp.tanh(cell)
        return (cell, hide), hide.astype(x.dtype)


class LSTMHead(nn.Module):
    """11x11 conv head (Reference: uniposeLSTM.py:85-89,120-124)."""

    out_channels: int
    width: int = 128
    # Dead-ReLU-avoidance bias init (Conv.bias_positive rationale); opt-in
    # via ModelConfig.head_positive_bias.
    positive_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda feats, k, name: Conv(  # noqa: E731
            feats, k, padding=k // 2, use_bias=True, torch_default_init=True,
            bias_positive=self.positive_bias, dtype=self.dtype, name=name,
        )
        x = nn.relu(conv(self.width, 11, "conv1")(x))
        x = nn.relu(conv(self.width, 11, "conv2")(x))
        x = nn.relu(conv(self.width, 11, "conv3")(x))
        x = nn.relu(conv(self.width, 1, "conv4")(x))
        x = nn.relu(conv(self.out_channels, 1, "conv5")(x))
        return x


class UniPoseLSTM(nn.Module):
    num_classes: int = 13
    output_stride: int = 16
    stride: int = 8
    wasp_double_conv2: bool = True
    # jax.checkpoint the scan body: saves only the small per-step cell
    # activations but costs ~7x train-step compile time — opt in via config
    # (ModelConfig.remat_scan).
    remat_scan: bool = False
    # Segmented gradient checkpointing of the per-frame backbone (the BPTT
    # memory sink — its activations scale with B*T while the scan carry is
    # tiny): each bottleneck is its own remat block (ResNet101.remat_blocks),
    # parameter paths unchanged.  Training only.  Measured numbers in
    # docs/BENCHMARKS.md remat study.
    remat_tower: bool = False
    # torch model.freeze_bn() semantics (Reference: model/uniposeLSTM.py:94-95,
    # 150-154, broken upstream): BN uses running stats during training.
    freeze_bn: bool = False
    # Dead-ReLU-avoidance init for the 11x11 head (Conv.bias_positive).
    head_positive_bias: bool = False
    # Per-group (ghost) BN statistics (TorchBatchNorm.stat_groups): the
    # trainer derives this from the mesh when ModelConfig.sync_bn=False so
    # BN stats stay local to each data-parallel shard.
    bn_groups: int = 1
    # Sequence/context parallelism (SURVEY §5.7 growth path): mesh axis names
    # (data_axis, time_axis) — either may be None.  When set, GSPMD sharding
    # constraints pin the carry-independent tower + head (≈99% of FLOPs,
    # batched over B*T) to shard frames across BOTH axes, while the tiny
    # ConvLSTM scan runs replicated on all-gathered per-frame features
    # ((T,B,h/8,w/8,K+2) — the cheapest tensor in the program, ~63 KB/frame
    # at 368² bf16).  This scales a SINGLE clip's rollout across chips,
    # which pure data parallelism cannot.  Callers must trace the jitted
    # step under ``jax.set_mesh(mesh)`` with matching axis names
    # (parallel/cp.py wraps this).
    spmd_axes: Optional[Tuple[Optional[str], Optional[str]]] = None
    dtype: Optional[jnp.dtype] = None

    def _frame_spec(self) -> Optional[P]:
        """PartitionSpec for (B*T, h, w, c) frame-major tensors.

        None during ``init``: shape inference needs no placement, and init
        is routinely traced outside any mesh context (Trainer state init,
        ``__graft_entry__``) — a ``with_sharding_constraint(P(...))`` there
        would raise.  Real applies still fail loudly without ``jax.set_mesh``.
        """
        if self.spmd_axes is None or self.is_initializing():
            return None
        axes = tuple(a for a in self.spmd_axes if a)
        if not axes:
            return None
        return P(axes if len(axes) > 1 else axes[0])

    @nn.compact
    def __call__(
        self,
        frames: jnp.ndarray,
        centermap: jnp.ndarray,
        *,
        train: bool = False,
        initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """frames (B, T, H, W, 3), centermap (B, T, H, W, 1) ->
        heatmaps (B, T, H/8, W/8, K+1).

        ``initial_state``: optional (cell, hide) carried in from a previous
        chunk — enables streaming eval over arbitrarily long videos in
        fixed-T chunks.  When None, frame 0 goes through ConvLSTM0 exactly
        like the reference's iter==0 branch (uniposeLSTM.py:106-124).
        """
        b, t, h, w, _ = frames.shape
        lstm_ch = self.num_classes + 2

        if self.dtype is not None:
            frames = frames.astype(self.dtype)

        frame_spec = self._frame_spec()

        # --- carry-independent tower, batched over B*T ---
        x = frames.reshape(b * t, h, w, frames.shape[-1])
        if frame_spec is not None:
            # Shard frames over data x time: the whole tower (backbone, WASP,
            # decoder — the FLOPs) partitions along its batch dim with zero
            # communication; XLA only inserts collectives for BN stats
            # (which makes sync-BN stats global over B*T, same as the
            # unsharded program).
            x = jax.lax.with_sharding_constraint(x, frame_spec)
        # remat_tower = SEGMENTED checkpointing: each bottleneck is its own
        # remat block (ResNet101.remat_blocks), so the backward holds one
        # block's activations at a time and saves only block boundaries.
        # Rematting the whole backbone as a single block was measured useless
        # on v5e (the recompute phase materializes every activation at once,
        # so peak temp barely moved: 4.71 -> 4.41 GiB at T=20) — granularity
        # is the knob, not the wrap (docs/BENCHMARKS.md remat study).
        backbone = ResNet101(
            output_stride=self.output_stride,
            freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups,
            remat_blocks=self.remat_tower,
            dtype=self.dtype,
            name="backbone",
        )
        feats, low_level = backbone(x, train=train)
        y = WASP(
            output_stride=self.output_stride,
            double_conv2=self.wasp_double_conv2,
            gap_batchnorm=False,  # video WASP quirk (waspVideo.py:56-59)
            freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups,
            dtype=self.dtype,
            name="wasp",
        )(feats, train=train)
        y = Decoder(
            self.num_classes, freeze_bn=self.freeze_bn,
            bn_groups=self.bn_groups, dtype=self.dtype,
            name="decoder",
        )(y, low_level, train=train)  # (B*T, h8, w8, K+1)

        cm = avg_pool2d(
            centermap.reshape(b * t, h, w, 1).astype(y.dtype), 9, 8, 1
        )  # (B*T, h8, w8, 1) — pool_center (uniposeLSTM.py:75,114)
        z = jnp.concatenate([y, cm], axis=-1)  # (B*T, h8, w8, K+2)
        h8, w8 = z.shape[1:3]
        z = z.reshape(b, t, h8, w8, lstm_ch)
        z = jnp.moveaxis(z, 1, 0)  # time-major (T, B, h8, w8, C)
        if frame_spec is not None:
            # The recurrence is inherently serial over T; all-gather the
            # per-frame features (the smallest tensor in the program) across
            # the time axis and run the cheap scan replicated.  Batch stays
            # sharded over the data axis.  Under autodiff the all-gather
            # transposes to a reduce-scatter of the feature cotangents.
            z = jax.lax.with_sharding_constraint(z, P(None, self.spmd_axes[0]))

        # --- recurrence ---
        if initial_state is None:
            cell0, hide0 = ConvLSTM0(lstm_ch, dtype=self.dtype, name="lstm_0")(z[0])
            rest = z[1:]
        else:
            cell0, hide0 = initial_state
            rest = z
        cell0 = cell0.astype(jnp.float32)  # f32 recurrent carry
        hide0 = hide0.astype(jnp.float32)

        # remat pays off only under autodiff (long-rollout BPTT memory);
        # in eval it just burns compile time.
        cell_cls = (
            nn.remat(ConvLSTMCell) if (self.remat_scan and train) else ConvLSTMCell
        )
        scanned = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=0,
            out_axes=0,
        )(self.num_classes + 2, dtype=self.dtype, name="lstm")
        (cell_t, hide_t), hides = scanned((cell0, hide0), rest)

        if initial_state is None:
            hides = jnp.concatenate(
                [hide0[None].astype(hides.dtype), hides], axis=0
            )  # (T, B, ...)

        # --- head, batched over B*T ---
        hides_bt = jnp.moveaxis(hides, 0, 1).reshape(b * t, h8, w8, lstm_ch)
        if frame_spec is not None:
            # Re-shard the hidden states frame-major so the 11x11 head (the
            # second-biggest FLOPs block) also partitions over data x time.
            hides_bt = jax.lax.with_sharding_constraint(hides_bt, frame_spec)
        heat = LSTMHead(
            self.num_classes + 1,
            positive_bias=self.head_positive_bias,
            dtype=self.dtype,
            name="head",
        )(hides_bt)
        heat = heat.reshape(b, t, h8, w8, self.num_classes + 1)

        self.sow("intermediates", "final_state", (cell_t, hide_t))
        return heat.astype(jnp.float32)
