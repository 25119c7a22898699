"""Training harness (L4): init / training / validation, mirroring the
reference Trainer's behavior on top of the compiled GSPMD step.

Reference: unipose.py:37-193 (image) and uniposeLSTM.py:37-215 (video) —
  * per-iteration step-decay LR (folded into the optax schedule);
  * per-epoch validation with PCK/PCKh/AP accumulated with per-joint
    visibility gating (unipose.py:163-176);
  * best-mAP checkpoint to ``<model_name>_best`` (unipose.py:183-186);
  * optional warm start from a torch ``*.pth.tar`` (unipose.py:78-90).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig, effective_spec
from unipose_tpu.data.loader import get_dataloader
from unipose_tpu.eval.metrics import accuracy_from_coords
from unipose_tpu.eval.report import print_accuracies
from unipose_tpu.parallel.cp import shard_clip_batch, under_mesh
from unipose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from unipose_tpu.train.checkpoint import save_checkpoint, warm_start_from_torch
from unipose_tpu.train.state import create_train_state
from unipose_tpu.train.steps import make_eval_step, make_train_step, make_val_step


class Trainer:
    def __init__(
        self,
        model_config: ModelConfig,
        train_config: TrainConfig,
        train_dir: Optional[str] = None,
        val_dir: Optional[str] = None,
        pretrained: Optional[str] = None,
        mesh=None,
        log_every: int = 50,
        spec=None,
        loaders=None,
        log_file: Optional[str] = None,
        print_summary: bool = False,
    ):
        """``spec``/``loaders`` overrides exist for tests and custom
        pipelines; by default both derive from ``model_config.dataset``."""
        self.model_config = model_config
        self.train_config = train_config
        # TrainConfig.sigma/stride overrides resolve into the spec here; all
        # downstream consumers (loaders + compiled steps) read the spec only.
        self.spec = effective_spec(
            spec or DATASETS[model_config.dataset], train_config
        )
        self.video = model_config.variant == "lstm"
        self.log_every = log_every

        if loaders is not None:
            self.train_loader, self.val_loader = loaders[0], loaders[1]
            self.test_loader = loaders[2] if len(loaders) > 2 else None
        else:
            self.train_loader, self.val_loader, self.test_loader = (
                get_dataloader(
                    model_config.dataset,
                    train_dir,
                    val_dir,
                    self.spec.sigma,
                    self.spec.stride,
                    train_config.workers,
                    train_config.batch_size,
                    frame_memory=model_config.frame_memory if self.video else None,
                    seed=train_config.seed,
                    val_batch_size=train_config.val_batch_size,
                    input_size=self.spec.input_size,
                )
                if (train_dir or val_dir)
                else (None, None, None)
            )

        self.mesh = mesh or make_mesh(train_config.mesh_shape, train_config.mesh_axes)
        # Sequence/context parallelism (parallel/cp.py): a model built with
        # ``spmd_axes`` carries with_sharding_constraint calls that need (a)
        # a mesh with those axes and (b) tracing under ``jax.set_mesh``;
        # video batches then shard (B, T) over (data, time), not batch-only.
        # Validated here, before the (expensive) state init, to fail fast.
        self.cp = self.video and model_config.spmd_axes is not None
        if self.cp:
            missing = [
                a for a in model_config.spmd_axes
                if a and a not in self.mesh.axis_names
            ]
            if missing:
                raise ValueError(
                    f"model_config.spmd_axes={model_config.spmd_axes} needs mesh "
                    f"axes {missing} but the mesh has {self.mesh.axis_names}; set "
                    "TrainConfig.mesh_shape/mesh_axes to match, e.g. "
                    "mesh_shape=(-1, t), mesh_axes=('data', 'time')"
                )

        # sync_bn semantics (the flag the reference accepts and ignores,
        # SURVEY §2.2): True (default) = BN statistics over the GLOBAL batch
        # — automatic under GSPMD, exact (tests/test_sync_bn.py).  False =
        # per-shard statistics: the model is built with one BN stat group per
        # data-parallel shard, so each device normalizes with its own
        # sub-batch moments and no cross-replica collective is inserted
        # (torch DDP-without-SyncBN semantics; running stats use the pooled
        # moments so the replicated EMA state stays consistent).
        bn_groups = 1
        if not model_config.sync_bn:
            if self.cp:
                raise ValueError(
                    "sync_bn=False (per-shard BN) is not supported together "
                    "with sequence/context parallelism: with frames of one "
                    "clip spread over the 'time' axis, per-device statistics "
                    "would split individual clips. Use sync_bn=True."
                )
            bn_groups = dict(
                zip(self.mesh.axis_names, self.mesh.devices.shape)
            ).get("data", 1)
            if bn_groups > 1 and train_config.batch_size % bn_groups != 0:
                raise ValueError(
                    f"sync_bn=False needs batch_size divisible by the data-"
                    f"parallel shard count ({bn_groups}); got "
                    f"{train_config.batch_size}"
                )
        self.bn_groups = bn_groups

        rng = jax.random.PRNGKey(train_config.seed)
        self.model, self.tx, self.state = create_train_state(
            model_config, train_config, rng, input_size=self.spec.input_size,
            bn_groups=bn_groups,
        )
        if pretrained:
            variant = "lstm" if self.video else "image"
            self.state = warm_start_from_torch(
                self.state, pretrained, variant=variant
            )

        # auto-resume from the newest periodic checkpoint (preemption story)
        self.ckpt_manager = None
        if train_config.checkpoint_dir:
            from unipose_tpu.train.checkpoint import CheckpointManager

            self.ckpt_manager = CheckpointManager(train_config.checkpoint_dir)
            restored = self.ckpt_manager.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                print(
                    f"resumed from step {int(self.state.step)} "
                    f"({train_config.checkpoint_dir})"
                )

        self.state = replicate(self.state, self.mesh)
        self.train_step = make_train_step(
            self.model, self.tx, self.spec, video=self.video,
            donate=train_config.donate_state,
        )
        self.eval_step = make_eval_step(self.model, self.spec, video=self.video)
        self.val_step = make_val_step(self.model, self.spec, video=self.video)
        if self.cp:
            self.train_step = under_mesh(self.mesh, self.train_step)
            self.eval_step = under_mesh(self.mesh, self.eval_step)
            self.val_step = under_mesh(self.mesh, self.val_step)

        self.is_best = 0.0
        self.best_pck = 0.0
        self.best_pckh = 0.0
        self.model_name = train_config.model_name

        # TSV metric log (counterpart of extra_utils/logger.py, §5.5)
        self.logger = None
        if log_file:
            from unipose_tpu.utils.logger import Logger

            self.logger = Logger(log_file, title=self.model_name)
            self.logger.set_names(["epoch", "train_loss", "mAP", "mPCK", "mPCKh"])
        self._epoch_stats = {}

        if print_summary:
            # param/FLOP audit (counterpart of get_model_summary,
            # utils/utils.py:713-829, called at unipose.py:96-98)
            from unipose_tpu.utils.summary import count_params, per_module_params

            print(f"Total Parameters: {count_params(self.state.params):,}")
            for name, n in sorted(per_module_params(self.state.params).items()):
                print(f"  {name:<12} {n:>14,}")

    # ------------------------------------------------------------------
    def _device_batch(self, batch):
        keep = ("image", "frames", "kpts", "centers")
        sub = {k: v for k, v in batch.items() if k in keep}
        if self.cp:
            return shard_clip_batch(sub, self.mesh)
        return shard_batch(sub, self.mesh)

    def training(self, epoch: int) -> float:
        print(f"Epoch {epoch}:")
        # Losses stay on device between log points: fetching the scalar every
        # step would force a device sync per iteration (~24 ms round-trip on
        # a tunneled TPU) and serialize host dispatch against device compute.
        pending = []
        train_loss = 0.0
        n = 0
        t0 = time.time()
        self.train_loader.set_epoch(epoch)
        for i, batch in enumerate(self.train_loader):
            self.state, metrics = self.train_step(
                self.state, self._device_batch(batch)
            )
            pending.append(metrics["loss"])
            n += 1
            if (i + 1) % self.log_every == 0:
                train_loss += float(jnp.sum(jnp.stack(pending)))  # one sync
                pending = []
                rate = n / (time.time() - t0)
                print(
                    f"  iter {i + 1}/{len(self.train_loader)} "
                    f"loss {train_loss / n:.6f} ({rate:.2f} it/s)"
                )
        if pending:
            train_loss += float(jnp.sum(jnp.stack(pending)))
        if self.ckpt_manager is not None:
            self.ckpt_manager.save(int(self.state.step), self.state)
        avg = train_loss / max(n, 1)
        self._epoch_stats[epoch] = avg
        return avg

    # ------------------------------------------------------------------
    def finalize(self) -> None:
        """Block until in-flight async checkpoint writes commit (call before
        process exit; saves are async so the train loop never stalls)."""
        if self.ckpt_manager is not None:
            self.ckpt_manager.wait()

    # ------------------------------------------------------------------
    def _device_batch_padded(self, batch, pad_to):
        """Pad a ragged trailing batch to the compiled batch size by
        repeating the last sample (static shapes, one compile).  Returns
        (device batch, n real samples, resolved pad size)."""
        keep = ("image", "frames", "kpts", "centers")
        sub = {key: np.asarray(v) for key, v in batch.items() if key in keep}
        n = next(iter(sub.values())).shape[0]
        if pad_to is None:
            pad_to = n
        if n < pad_to:
            sub = {
                key: np.concatenate([v, np.repeat(v[-1:], pad_to - n, axis=0)])
                for key, v in sub.items()
            }
        put = shard_clip_batch if self.cp else shard_batch
        return put(sub, self.mesh), n, pad_to

    def validation(self, epoch: int) -> float:
        """TPU-first validation (reference behavior: unipose.py:133-193).

        The reference pulls full heatmaps to host per batch-1 sample and
        syncs per batch; here the forward runs batched, heatmap argmax for
        predictions AND targets happens on device (make_val_step), the loop
        enqueues all batches without a single host sync, and the host sees
        one concatenated (N, K+1, 2) coord fetch at the end.  Metric values
        are identical: per-frame ``accuracy_from_coords`` with the same
        running-mean + visibility gating (unipose.py:163-176), pinned
        against the oracle ``accuracy`` in tests/test_train.py."""
        k = self.model_config.num_classes
        AP = np.zeros(k + 1)
        PCK = np.zeros(k + 1)
        PCKh = np.zeros(k + 1)
        count = np.zeros(k + 1)
        mAP = mPCK = mPCKh = 0.0

        pending = []  # (pred coords, target coords, loss) device arrays
        valids = []
        pad_to = getattr(self.val_loader, "batch_size", None)
        for batch in self.val_loader:
            db, n_valid, pad_to = self._device_batch_padded(batch, pad_to)
            pending.append(
                self.val_step(self.state.params, self.state.batch_stats, db)
            )
            valids.append(n_valid)
        if not pending:
            return 0.0

        # one sync point: three device->host fetches for the whole epoch
        preds = np.asarray(jnp.concatenate([p for p, _, _ in pending]))
        tgts = np.asarray(jnp.concatenate([t for _, t, _ in pending]))
        val_loss = float(jnp.sum(jnp.stack([l for _, _, l in pending])))

        hm = self.spec.heatmap_size
        frames = []  # per-frame (pred (K+1,2), target (K+1,2)), dataset order
        for bi, n_valid in enumerate(valids):
            for s in range(n_valid):
                i = bi * pad_to + s
                if self.video:
                    frames.extend(
                        (preds[i, j], tgts[i, j]) for j in range(preds.shape[1])
                    )
                else:
                    frames.append((preds[i], tgts[i]))

        for frame_idx, (p, t) in enumerate(frames):
            acc, acc_pck, acc_pckh, _, _, visible = accuracy_from_coords(
                p[None], t[None], hm, hm, 0.2, 0.5, self.model_config.dataset
            )
            # running means, visibility-gated per joint (unipose.py:163-176)
            AP[0] = (AP[0] * frame_idx + acc[0]) / (frame_idx + 1)
            PCK[0] = (PCK[0] * frame_idx + acc_pck[0]) / (frame_idx + 1)
            PCKh[0] = (PCKh[0] * frame_idx + acc_pckh[0]) / (frame_idx + 1)
            for j in range(1, k + 1):
                if visible[j] == 1:
                    AP[j] = (AP[j] * count[j] + acc[j]) / (count[j] + 1)
                    PCK[j] = (PCK[j] * count[j] + acc_pck[j]) / (count[j] + 1)
                    PCKh[j] = (PCKh[j] * count[j] + acc_pckh[j]) / (count[j] + 1)
                    count[j] += 1

        mAP = AP[1:].sum() / k
        mPCK = PCK[1:].sum() / k
        mPCKh = PCKh[1:].sum() / k

        print_accuracies(mAP, AP, mPCKh, PCKh, mPCK, PCK, self.model_config.dataset)

        if mAP > self.is_best:
            self.is_best = mAP
            if self.model_name:
                save_checkpoint(self.state, True, self.model_name)
                print(f"Model saved to {self.model_name}")
        self.best_pckh = max(self.best_pckh, mPCKh)
        self.best_pck = max(self.best_pck, mPCK)
        print(
            "Best AP = %.2f%%; PCK = %2.2f%%; PCKh = %2.2f%%"
            % (self.is_best * 100, self.best_pck * 100, self.best_pckh * 100)
        )
        if self.logger is not None:
            self.logger.append(
                [epoch, self._epoch_stats.get(epoch, float("nan")), mAP, mPCK, mPCKh]
            )
        return mAP

    # ------------------------------------------------------------------
    def test(self, image_path: str, out_dir: str = "samples"):
        """Demo inference on one image: skeleton render + per-channel JET
        heatmap overlays (Reference: unipose.py:197-246 ``Trainer.test``).
        Returns the predicted keypoints."""
        import cv2

        from unipose_tpu.ops.resize import bilinear_resize
        from unipose_tpu.train.steps import preprocess_images
        from unipose_tpu.viz.draw import draw_paint, get_kpts, heatmap_overlays

        size = self.spec.input_size
        img = np.asarray(
            cv2.resize(cv2.imread(image_path), (size, size)), np.float32
        )
        x = preprocess_images(img[None])
        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        if self.video:
            heat = self.model.apply(
                variables,
                x[:, None],
                jnp.zeros((1, 1, size, size, 1)),
                train=False,
            )[:, 0]
        else:
            heat = self.model.apply(variables, x, train=False)
        heat = np.asarray(bilinear_resize(heat, (size, size)))  # 46 -> input res
        kpts = get_kpts(heat, img_h=float(size), img_w=float(size))
        import os

        os.makedirs(out_dir, exist_ok=True)
        draw_paint(
            image_path,
            kpts,
            self.model_config.dataset,
            out_path=os.path.join(out_dir, "pose.png"),
        )
        heatmap_overlays(heat, image_path, out_dir=os.path.join(out_dir, "heat"))
        return kpts
