"""jit/pjit train and eval steps with fused device-side preprocessing.

The reference's hot loop (Reference: unipose.py:100-131, §3.2) does CPU-side
normalization + per-sample numpy Gaussian targets in DataLoader workers, then
``.cuda()`` copies.  Here raw images and keypoints stream to the device and
normalization ((x-128)/256, utils/lsp_lspet_data.py:242-243) plus target
rendering fuse into the compiled step — input decode-to-heatmap never touches
host math (BASELINE.json north star).

Loss: MSE over all heatmap elements (unipose.py:70,117).  The video step sums
per-frame MSE means (uniposeLSTM.py:124-128), i.e. ``T * mean``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from unipose_tpu.core.config import DatasetSpec
from unipose_tpu.ops.heatmap import gaussian_heatmaps, render_targets
from unipose_tpu.train.state import TrainState

MEAN = 128.0
STD = 256.0


def preprocess_images(images: jnp.ndarray) -> jnp.ndarray:
    """(x - 128) / 256, any leading dims, BGR channel-last."""
    return (images - MEAN) / STD


def make_targets(
    kpts: jnp.ndarray, spec: DatasetSpec
) -> jnp.ndarray:
    """(..., K, 3) keypoints -> (..., H/8, W/8, K+1) heatmaps."""
    size = spec.input_size
    return render_targets(kpts[..., :2], size, size, spec.stride, spec.sigma)


def make_centermaps(centers: jnp.ndarray, spec: DatasetSpec) -> jnp.ndarray:
    """(..., 2) centers -> (..., H, W, 1) full-res sigma-3 centermaps
    (utils/lsp_lspet_data.py:236-240, penn_action_data.py:129-133)."""
    size = spec.input_size
    return gaussian_heatmaps(centers, (size, size), 3.0)[..., None]


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target.astype(pred.dtype)))


def _dropout_key(rng: jnp.ndarray):
    """Typed ``rbg`` key for dropout mask generation.

    The decoder's dropout masks are large ((B, 92, 92, 256)-scale) and
    threefry bit generation for them costs ~5.3 ms of a 73 ms train step on
    v5e (scripts/profile_train_variants2.py).  XLA's hardware
    RngBitGenerator (``rbg``) is far cheaper on TPU.  The random stream
    differs from threefry — dropout streams are arbitrary; determinism per
    (seed, step) is preserved, and fold_in/split on rbg keys still use
    threefry so per-layer decorrelation is unchanged.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng  # already typed; respect the caller's impl
    return jax.random.wrap_key_data(jnp.concatenate([rng, rng]), impl="rbg")


def make_train_step(
    model,
    tx,
    spec: DatasetSpec,
    *,
    video: bool = False,
    donate: bool = True,
    fused_loss: bool = False,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the compiled train step.

    Batch layout (all raw, device-side preprocessing):
      image variant: image (B, H, W, 3), kpts (B, K, 3)
      video variant: frames (B, T, H, W, 3), kpts (B, T, K, 3),
                     centers (B, T, 2)

    ``fused_loss`` (image variant): use the Pallas kernel that synthesizes
    Gaussian targets inside the loss fwd/bwd instead of materializing them
    (ops/pallas/heatmap_loss.py).
    """

    def step(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        dropout_rng = _dropout_key(dropout_rng)

        if video:
            x = preprocess_images(batch["frames"])
            targets = make_targets(batch["kpts"], spec)
            centermaps = make_centermaps(batch["centers"], spec)
            t = x.shape[1]
        else:
            x = preprocess_images(batch["image"])
            targets = None if fused_loss else make_targets(batch["kpts"], spec)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if video:
                out, mutated = model.apply(
                    variables,
                    x,
                    centermaps,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
                loss = mse(out, targets) * t  # sum of per-frame MSEs
            else:
                out, mutated = model.apply(
                    variables,
                    x,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
                if fused_loss:
                    from unipose_tpu.ops.pallas.heatmap_loss import heatmap_mse

                    loss = heatmap_mse(
                        out,
                        batch["kpts"][..., :2],
                        spec.stride,
                        spec.sigma,
                        jax.default_backend() != "tpu",  # interpret off-TPU
                    )
                else:
                    loss = mse(out, targets)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=rng,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_val_step(model, spec: DatasetSpec, *, video: bool = False):
    """Compiled validation step — the TPU-first successor of the reference's
    host-bound loop (unipose.py:133-193 pulls full heatmaps to host per
    batch-1 sample and argmaxes in Python).

    Forward runs in eval mode at batch B; heatmap argmax for both predictions
    and rendered targets runs on device (eval/metrics.py
    ``get_max_preds_device``, identical first-max semantics), so only
    (B,[T,]K,2) coordinates and a scalar loss cross to host — the (B,46,46,K+1)
    heatmaps never leave HBM.  Metric math on the coords is host-side
    ``accuracy_from_coords`` (pinned equal to the reference ``accuracy``).
    """
    from unipose_tpu.eval.metrics import get_max_preds_device

    def step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        if video:
            x = preprocess_images(batch["frames"])
            targets = make_targets(batch["kpts"], spec)
            centermaps = make_centermaps(batch["centers"], spec)
            out = model.apply(variables, x, centermaps, train=False)
            loss = mse(out, targets) * x.shape[1]
            b, t = out.shape[0], out.shape[1]
            flat = lambda a: a.reshape((b * t,) + a.shape[2:])  # noqa: E731
            pred, _ = get_max_preds_device(flat(out.astype(jnp.float32)))
            tgt, _ = get_max_preds_device(flat(targets))
            k = pred.shape[1]
            pred = pred.reshape(b, t, k, 2)
            tgt = tgt.reshape(b, t, k, 2)
        else:
            x = preprocess_images(batch["image"])
            targets = make_targets(batch["kpts"], spec)
            out = model.apply(variables, x, train=False)
            loss = mse(out, targets)
            pred, _ = get_max_preds_device(out.astype(jnp.float32))
            tgt, _ = get_max_preds_device(targets)
        return pred, tgt, loss

    return jax.jit(step)


def make_eval_step(model, spec: DatasetSpec, *, video: bool = False):
    """Compiled eval step: forward in eval mode; returns f32 heatmaps and
    rendered targets (both NHWC) plus the per-batch MSE loss."""

    def step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        if video:
            x = preprocess_images(batch["frames"])
            targets = make_targets(batch["kpts"], spec)
            centermaps = make_centermaps(batch["centers"], spec)
            out = model.apply(variables, x, centermaps, train=False)
            loss = mse(out, targets) * x.shape[1]
        else:
            x = preprocess_images(batch["image"])
            targets = make_targets(batch["kpts"], spec)
            out = model.apply(variables, x, train=False)
            loss = mse(out, targets)
        return out, targets, loss

    return jax.jit(step)
