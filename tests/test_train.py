"""Train/eval step tests on tiny shapes over the 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from unipose_tpu.train.optim import step_decay_schedule
from unipose_tpu.train.state import create_train_state
from unipose_tpu.train.steps import make_eval_step, make_train_step

SIZE = 64


def tiny_spec(name="LSP"):
    return dataclasses.replace(DATASETS[name], input_size=SIZE)


def image_batch(rng, b=2, k=14):
    return {
        "image": jnp.asarray(rng.rand(b, SIZE, SIZE, 3).astype(np.float32) * 255),
        "kpts": jnp.asarray(
            np.concatenate(
                [rng.rand(b, k, 2) * SIZE, np.ones((b, k, 1))], axis=-1
            ).astype(np.float32)
        ),
    }


def video_batch(rng, b=1, t=2, k=13):
    return {
        "frames": jnp.asarray(rng.rand(b, t, SIZE, SIZE, 3).astype(np.float32) * 255),
        "kpts": jnp.asarray(
            np.concatenate(
                [rng.rand(b, t, k, 2) * SIZE, np.ones((b, t, k, 1))], axis=-1
            ).astype(np.float32)
        ),
        "centers": jnp.asarray(
            (rng.rand(b, t, 2) * SIZE).astype(np.float32)
        ),
    }


def test_schedule_matches_reference_policy():
    sched = step_decay_schedule(1e-4, 0.333, 13275)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(13274)) == pytest.approx(1e-4)
    assert float(sched(13275)) == pytest.approx(1e-4 * 0.333)
    assert float(sched(2 * 13275)) == pytest.approx(1e-4 * 0.333**2, rel=1e-5)


def test_schedule_warmup():
    """``warmup_steps`` ramps 0 -> base_lr linearly, then hands off to the
    reference staircase (which starts counting at the end of the ramp).
    Default 0 must reproduce the reference schedule bit-for-bit."""
    base, gamma, step_size, w = 1e-4, 0.333, 100, 20
    sched = step_decay_schedule(base, gamma, step_size, warmup_steps=w)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(w // 2)) == pytest.approx(base / 2)
    assert float(sched(w)) == pytest.approx(base)
    assert float(sched(w + step_size - 1)) == pytest.approx(base)
    assert float(sched(w + step_size)) == pytest.approx(base * gamma)
    # off = reference policy exactly
    ref = step_decay_schedule(base, gamma, step_size)
    off = step_decay_schedule(base, gamma, step_size, warmup_steps=0)
    for s in (0, 1, step_size, 2 * step_size):
        assert float(off(s)) == float(ref(s))


def test_val_fast_path_matches_oracle(rng):
    """The TPU-first validation pipeline (device argmax -> coords ->
    accuracy_from_coords, per frame) must reproduce the reference-semantics
    oracle (full-heatmap ``accuracy``) exactly — including argmax
    tie-breaking (duplicated maxima planted) and the running-mean /
    visibility gating of the epoch accumulators (unipose.py:163-176)."""
    from unipose_tpu.eval.metrics import (
        accuracy,
        accuracy_from_coords,
        get_max_preds_device,
    )

    n, k1, hm = 7, 15, 46  # 14 joints + background
    heat = rng.rand(n, hm, hm, k1).astype(np.float32)
    target = np.zeros((n, hm, hm, k1), np.float32)
    ys = (rng.rand(n, k1) * hm).astype(int)
    xs = (rng.rand(n, k1) * hm).astype(int)
    for i in range(n):
        for c in range(k1):
            target[i, ys[i, c], xs[i, c], c] = 1.0
    # plant argmax ties: duplicate each frame-0 max at another location
    for c in range(k1):
        m = heat[0, :, :, c].max()
        heat[0, (ys[0, c] + 7) % hm, (xs[0, c] + 9) % hm, c] = m

    def run_epoch(frame_fn):
        k = k1 - 1
        AP = np.zeros(k1)
        count = np.zeros(k1)
        for frame_idx in range(n):
            acc, _, _, _, _, visible = frame_fn(frame_idx)
            AP[0] = (AP[0] * frame_idx + acc[0]) / (frame_idx + 1)
            for j in range(1, k + 1):
                if visible[j] == 1:
                    AP[j] = (AP[j] * count[j] + acc[j]) / (count[j] + 1)
                    count[j] += 1
        return AP, count

    # oracle: reference loop shape — full heatmaps, host argmax, batch 1
    AP_ref, cnt_ref = run_epoch(
        lambda i: accuracy(
            heat[i : i + 1], target[i : i + 1], 0.2, 0.5, "LSP", layout="NHWC"
        )
    )

    # fast path: batched device argmax once, coords-only metrics
    pred_dev, _ = get_max_preds_device(jnp.asarray(heat))
    tgt_dev, _ = get_max_preds_device(jnp.asarray(target))
    pred_np, tgt_np = np.asarray(pred_dev), np.asarray(tgt_dev)
    AP_fast, cnt_fast = run_epoch(
        lambda i: accuracy_from_coords(
            pred_np[i : i + 1], tgt_np[i : i + 1], hm, hm, 0.2, 0.5, "LSP"
        )
    )

    np.testing.assert_array_equal(cnt_ref, cnt_fast)
    np.testing.assert_allclose(AP_ref, AP_fast, rtol=0, atol=0)


def test_trainconfig_sigma_stride_overrides_reach_targets(rng):
    """TrainConfig.sigma/stride are real knobs: resolving them through
    effective_spec changes the rendered Gaussian targets (a YAML
    ``train.sigma`` override must not silently no-op)."""
    from unipose_tpu.core.config import effective_spec
    from unipose_tpu.ops.heatmap import render_targets
    from unipose_tpu.train.steps import make_targets

    spec = tiny_spec("LSP")
    kpts = image_batch(rng)["kpts"]

    default = make_targets(kpts, effective_spec(spec, TrainConfig()))
    assert float(spec.sigma) == 3.0  # default flows from the spec

    over = effective_spec(spec, TrainConfig(sigma=5.0))
    assert over.sigma == 5.0
    got = make_targets(kpts, over)
    want = render_targets(kpts[..., :2], SIZE, SIZE, spec.stride, 5.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    assert not np.allclose(np.asarray(got), np.asarray(default))

    # stride override changes the rendered resolution
    st = effective_spec(spec, TrainConfig(stride=4))
    assert st.heatmap_size == SIZE // 4
    assert make_targets(kpts, st).shape == (2, SIZE // 4, SIZE // 4, 15)


def test_image_train_step_reduces_loss(rng):
    spec = tiny_spec("LSP")
    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(batch_size=2, lr=1e-3)
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState

    model = build_model(mc)
    tx = make_optimizer(tc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model, tx, spec, donate=False)
    batch = image_batch(rng)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert losses[-1] < losses[0]

    eval_step = make_eval_step(model, spec)
    heat, target, loss = eval_step(state.params, state.batch_stats, batch)
    assert heat.shape == (2, SIZE // 8, SIZE // 8, 15)
    assert target.shape == heat.shape


def test_video_train_step_runs(rng):
    spec = tiny_spec("Penn_Action")
    mc = ModelConfig(dataset="Penn_Action", num_classes=13, variant="lstm")
    tc = TrainConfig(batch_size=1, lr=1e-3, sigma=1.0)
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState

    model = build_model(mc)
    f = jnp.zeros((1, 2, SIZE, SIZE, 3))
    c = jnp.zeros((1, 2, SIZE, SIZE, 1))
    variables = model.init(jax.random.PRNGKey(0), f, c, train=False)
    tx = make_optimizer(tc)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model, tx, spec, video=True, donate=False)
    batch = video_batch(rng)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    eval_step = make_eval_step(model, spec, video=True)
    heat, target, loss = eval_step(state.params, state.batch_stats, batch)
    assert heat.shape == (1, 2, SIZE // 8, SIZE // 8, 14)


def _lstm_loss_and_grads(mc, batch, spec):
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.steps import make_targets, mse, preprocess_images

    model = build_model(mc)
    variables = build_model(dataclasses.replace(mc, remat_tower=False)).init(
        jax.random.PRNGKey(0),
        batch["frames"],
        jnp.zeros_like(batch["frames"][..., :1]),  # centermap
        train=False,
    )

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            preprocess_images(batch["frames"]),
            jnp.zeros_like(batch["frames"][..., :1]),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return mse(out, make_targets(batch["kpts"], spec)), mut["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return loss, stats, grads


def test_remat_tower_grad_equivalence(rng):
    """remat_tower (segmented per-bottleneck backbone checkpointing for
    long-rollout BPTT memory) must be semantically value-invariant.

    The primal is pinned bit-exact with BN frozen to running stats (dropout
    still active — so rng plumbing, scan, head, and the whole backward are
    covered).  Gradients are pinned tightly but NOT bit-exact: a real remat
    recomputes the forward inside the backward with different XLA fusion
    order, so f32 rounding differs at the ulp level.  (A previous version of
    this test asserted bit-exact grads and passed — because prevent_cse was
    False and XLA's CSE had silently deleted the rematerialization entirely;
    see the docs/BENCHMARKS.md remat study.  Bit-exactness here would be a
    bug signal, not a quality bar.)  With train-mode BN the batch-moment
    reassociation amplifies through ~100 BN layers — the loss is pinned at
    1e-4 there."""
    spec = tiny_spec("Penn_Action")
    batch = video_batch(rng, t=3)
    mc = ModelConfig(
        dataset="Penn_Action", num_classes=13, variant="lstm", freeze_bn=True
    )
    l0, s0, g0 = _lstm_loss_and_grads(mc, batch, spec)
    l1, s1, g1 = _lstm_loss_and_grads(
        dataclasses.replace(mc, remat_tower=True), batch, spec
    )
    assert float(l0) == float(l1)  # bit-exact primal
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-7),
        g0,
        g1,
    )
    # running stats are untouched under freeze_bn -> still bit-exact
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), s0, s1
    )

    # train-mode BN: the batch moments are computed inside the remat blocks
    # with different fusion, so f32 reassociation shows up in the primal too
    # (measured ~2e-5 rel after ~100 BN layers) — loss pinned at 1e-4
    mc = ModelConfig(dataset="Penn_Action", num_classes=13, variant="lstm")
    l0, _, _ = _lstm_loss_and_grads(mc, batch, spec)
    l1, _, _ = _lstm_loss_and_grads(
        dataclasses.replace(mc, remat_tower=True), batch, spec
    )
    assert float(l0) == pytest.approx(float(l1), rel=1e-4)


def test_sharded_train_step_on_mesh(rng, eight_devices):
    """Full GSPMD data-parallel step over the 8-device mesh: batch sharded on
    'data', params replicated, BN stats become global-batch stats."""
    spec = tiny_spec("LSP")
    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(batch_size=8, lr=1e-3)
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState

    model = build_model(mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )
    tx = make_optimizer(tc)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1),
    )
    mesh = make_mesh((8,), ("data",))
    state = replicate(state, mesh)
    batch = shard_batch(
        {k: np.asarray(v) for k, v in image_batch(rng, b=8).items()}, mesh
    )
    assert batch["image"].sharding.spec[0] == "data"

    step = make_train_step(model, tx, spec, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path, rng):
    from unipose_tpu.train.checkpoint import restore_train_state, save_train_state
    from unipose_tpu.train.state import TrainState

    state = TrainState(
        params={"w": jnp.arange(4.0)},
        batch_stats={"m": jnp.ones((2,))},
        opt_state=(),
        step=jnp.asarray(7, jnp.int32),
        rng=jax.random.PRNGKey(3),
    )
    path = save_train_state(str(tmp_path / "ckpt"), state)
    restored = restore_train_state(path, state)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))


def test_async_save_visible_to_fresh_manager_same_process(tmp_path):
    """Saves are async; a manager freshly opened over the same directory
    can't wait on *another instance's* in-flight write via orbax alone, so
    CheckpointManager keeps a per-directory registry and waits on the prior
    live instance at open.  Without it, same-process reopen-and-resume
    (exactly what the Trainer does when constructed twice on one
    checkpoint_dir) silently restarts from scratch."""
    from unipose_tpu.train.checkpoint import CheckpointManager
    from unipose_tpu.train.state import TrainState

    state = TrainState(
        params={"w": jnp.arange(4.0)},
        batch_stats={"m": jnp.ones((2,))},
        opt_state=(),
        step=jnp.asarray(3, jnp.int32),
        rng=jax.random.PRNGKey(3),
    )
    mgr_a = CheckpointManager(str(tmp_path / "ckpt"))
    mgr_a.save(3, state)  # async: returns before the write commits
    # no mgr_a.wait() — a fresh manager must still see the step
    mgr_b = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr_b.latest_step() == 3
    restored = mgr_b.restore_latest(state)
    assert int(restored.step) == 3
    mgr_a.close()
    mgr_b.close()


def test_fused_loss_step_matches_default(rng):
    """The Pallas fused-loss train step computes the same loss/grads as the
    materializing path (first-step loss equality on identical state)."""
    spec = tiny_spec("LSP")
    mc = ModelConfig(dataset="LSP", num_classes=14)
    tc = TrainConfig(batch_size=2, lr=1e-3)
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState

    model = build_model(mc)
    tx = make_optimizer(tc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )

    def fresh_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(1),
        )

    batch = image_batch(rng)
    s_def, m_def = make_train_step(model, tx, spec, donate=False)(
        fresh_state(), batch
    )
    s_fused, m_fused = make_train_step(
        model, tx, spec, donate=False, fused_loss=True
    )(fresh_state(), batch)
    assert float(m_def["loss"]) == pytest.approx(float(m_fused["loss"]), rel=1e-5)
    # Post-Adam params can differ by +-2*lr wherever a near-zero gradient's
    # sign flips between numerically-equivalent paths; compare updates with
    # that slack (exact gradient parity is pinned in test_pallas_loss).
    a = jax.tree_util.tree_leaves(s_def.params)[0]
    b = jax.tree_util.tree_leaves(s_fused.params)[0]
    assert float(jnp.abs(a - b).max()) <= 2 * tc.lr + 1e-6
