"""Sequence/context parallelism (parallel/cp.py + UniPoseLSTM.spmd_axes).

Exactness discipline mirrors test_sync_bn — GSPMD may only change WHERE the
math runs — but with one twist learned the hard way: the full train-mode
MSE *gradient* at random init is catastrophically ill-conditioned, so a
naive sharded-vs-unsharded gradient comparison is meaningless there.

Measured (this repo, 64² Penn model, f32, CPU mesh):
  * at raw init the decoder output feeding the ConvLSTM has scale ~2e5
    under eval BN (running stats mean=0/var=1 on un-normalized stacks),
    so the lstm_0/head gates are SATURATED and the cotangent reaching the
    tower is a ~5e-7 sliver — a 1e-5 relative jitter on the features
    swings that cotangent ~30%, near-uniformly (it shifts the gain of the
    few unsaturated paths, which multiplies every upstream gradient);
  * in train mode a 1e-6 relative jitter on the *input frames* moves
    gradients by 15-45% (BN batch stats shift -> ReLU flips cascade
    through 101 layers) — even with calibrated stats;
  * with BN stats CALIBRATED (20 train-mode applies), eval-mode VJP
    medians land at 1.000000 +- 7e-5: the gates unsaturate and the
    backward is measurably exact under sharding.
The sharded program's f32 reassociation drift is equivalent to such a
jitter, so train-mode sharded gradients land at the jitter distance —
that is the conditioning FLOOR of the function itself, not a sharding
error.

What is asserted instead:
  * eval forward: exact to reassociation tolerance (both mesh layouts);
  * eval fixed-cotangent VJP on calibrated stats: per-group median
    gradient ratio == 1 tightly.  A semantic backward bug (missed/extra
    collective) scales every entry — a 4-device missed psum shows as
    ratio ~4 — while conditioning noise leaves the median at 1;
  * train-mode fixed-cotangent VJP + BN stat update: median deviation
    within 3x the in-test jitter floor (backward-error style bound), and
    no factor-level blowup;
  * train-step loss (well-conditioned): tight;
  * streaming chunked eval composes with time sharding;
  * the compiled CP program really contains time collectives.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
from unipose_tpu.models.unipose import build_model
from unipose_tpu.parallel.cp import (
    make_video_mesh,
    shard_clip_batch,
    under_mesh,
)
from unipose_tpu.parallel.mesh import replicate
from unipose_tpu.train.steps import (
    make_train_step,
    make_centermaps,
    preprocess_images,
)

SIZE = 64
K = 13


def tiny_spec():
    return dataclasses.replace(DATASETS["Penn_Action"], input_size=SIZE)


def video_batch(rng, b, t, k=K):
    return {
        "frames": (rng.rand(b, t, SIZE, SIZE, 3) * 255).astype(np.float32),
        "kpts": np.concatenate(
            [rng.rand(b, t, k, 2) * SIZE, np.ones((b, t, k, 1))], axis=-1
        ).astype(np.float32),
        "centers": (rng.rand(b, t, 2) * SIZE).astype(np.float32),
    }


@pytest.fixture(scope="module")
def cp_models():
    base_cfg = ModelConfig(
        dataset="Penn_Action", num_classes=K, variant="lstm", frame_memory=4
    )
    cp_cfg = dataclasses.replace(base_cfg, spmd_axes=("data", "time"))
    base = build_model(base_cfg)
    cp = build_model(cp_cfg)
    variables = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, SIZE, SIZE, 3)),
        jnp.zeros((1, 2, SIZE, SIZE, 1)),
        train=False,
    )
    return base, cp, variables


def forward(model, variables, batch, spec):
    x = preprocess_images(jnp.asarray(batch["frames"]))
    cm = make_centermaps(jnp.asarray(batch["centers"]), spec)
    return model.apply(variables, x, cm, train=False)


@pytest.mark.parametrize(
    "n_data,n_time,b,t",
    [(1, 8, 1, 8), (2, 4, 2, 4)],
    ids=["time-only", "data-x-time"],
)
def test_cp_forward_matches_unsharded(rng, cp_models, n_data, n_time, b, t):
    """Eval forward with frames sharded over (data, time) == single-device."""
    spec = tiny_spec()
    base, cp, variables = cp_models
    batch = video_batch(rng, b, t)

    want = np.asarray(jax.jit(lambda v, bt: forward(base, v, bt, spec))(
        variables, batch
    ))

    mesh = make_video_mesh(n_data, n_time)
    sharded = shard_clip_batch(batch, mesh)
    vrep = replicate(variables, mesh)
    fwd = under_mesh(mesh, jax.jit(lambda v, bt: forward(cp, v, bt, spec)))
    got = np.asarray(fwd(vrep, sharded))

    assert got.shape == (b, t, SIZE // 8, SIZE // 8, K + 1)
    # Partitioned convs reduce in different blockings per shard size; f32
    # reassociation drift compounds through the 101-layer tower (same class
    # of diff as running the unsharded model at a different batch size).
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_cp_program_contains_time_collectives(rng, cp_models):
    """The sharded program must actually partition over time: the pre-scan
    feature all-gather (the one communication the design calls for) shows up
    as a collective in the compiled module."""
    spec = tiny_spec()
    _, cp, variables = cp_models
    batch = video_batch(rng, 1, 8)
    mesh = make_video_mesh(1, 8)
    sharded = shard_clip_batch(batch, mesh)
    vrep = replicate(variables, mesh)
    with jax.set_mesh(mesh):
        lowered = jax.jit(lambda v, bt: forward(cp, v, bt, spec)).lower(
            vrep, sharded
        )
        txt = lowered.compile().as_text()
    assert "all-gather" in txt or "all-to-all" in txt or "collective" in txt, (
        "no collectives in the CP program — tower is not actually sharded"
    )


@pytest.fixture(scope="module")
def calibrated(cp_models, rng_module):
    """Variables with BN running stats calibrated by 20 train-mode applies
    on random data — brings eval activations from ~2e5 to O(0.3), which
    unsaturates the ConvLSTM gates and makes the backward well-conditioned
    enough to assert tightly (module docstring)."""
    base, _, variables = cp_models
    spec = tiny_spec()
    batch = video_batch(rng_module, 2, 2)
    x = preprocess_images(jnp.asarray(batch["frames"]))
    cm = make_centermaps(jnp.asarray(batch["centers"]), spec)

    @jax.jit
    def calib(bs):
        _, upd = base.apply(
            {"params": variables["params"], "batch_stats": bs}, x, cm,
            train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(9)},
        )
        return upd["batch_stats"]

    bs = variables["batch_stats"]
    for _ in range(20):
        bs = calib(bs)
    return {"params": variables["params"], "batch_stats": bs}


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(1234)


def _pullback(model, variables, spec, params, frames, centers, cot, *, train):
    """Fixed-cotangent VJP through the whole model; returns (param grads,
    updated batch_stats or None).  A fixed cotangent sidesteps the
    ill-conditioned MSE cotangent (module docstring) — it tests that every
    op's transpose, including the collective transposes GSPMD inserts, is
    semantically correct."""
    x = preprocess_images(frames)
    cm = make_centermaps(centers, spec)
    if train:
        dkey = jax.random.key(1)  # typed threefry: value-det under sharding

        def f(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, cm, train=True, mutable=["batch_stats"],
                rngs={"dropout": dkey},
            )
            return out, upd["batch_stats"]

        (out, bs), vjp = jax.vjp(f, params)
        zero_bs = jax.tree_util.tree_map(jnp.zeros_like, bs)
        return vjp((cot, zero_bs))[0], bs

    def g(p):
        return model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, cm, train=False,
        )

    _, vjp = jax.vjp(g, params)
    return vjp(cot)[0], None


def _relmax_per_group(g1, g2):
    """max |a-b| / max|a| per top-level param group."""
    out = {}
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0], jax.tree_util.tree_leaves(g2)
    ):
        a = np.asarray(a)
        b_ = np.asarray(b_)
        rel = float(np.abs(b_ - a).max() / (np.abs(a).max() + 1e-30))
        group = jax.tree_util.keystr(path).split("'")[1]
        out[group] = max(out.get(group, 0.0), rel)
    return out


def _median_ratio_per_group(g1, g2):
    """Per-group median of elementwise b/a over the large entries of each
    leaf.  A systematic backward bug (missed psum, double-counted shard)
    scales EVERY entry, pulling the median far from 1; conditioning noise
    (ReLU mask flips on entries near 0) leaves the median at 1."""
    out = {}
    for (path, a), b_ in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0], jax.tree_util.tree_leaves(g2)
    ):
        a = np.asarray(a).ravel()
        b_ = np.asarray(b_).ravel()
        m = np.abs(a) > np.abs(a).max() * 0.1 + 1e-30
        if not m.any():
            continue
        group = jax.tree_util.keystr(path).split("'")[1]
        out.setdefault(group, []).append(float(np.median(b_[m] / a[m])))
    return {g: float(np.median(rs)) for g, rs in out.items()}


@pytest.mark.slow
def test_cp_eval_vjp_exact(rng, cp_models, calibrated):
    """Eval-mode whole-model VJP with a fixed well-scaled cotangent under a
    (2, 2) data x time mesh, on calibrated BN stats: per-group median
    gradient ratio == 1 tightly.  A systematic scale is the signature of a
    semantic backward bug (a missed psum over the 4-device mesh would show
    as ratio ~4); measured clean value is 1.000000 +- 7e-5."""
    spec = tiny_spec()
    base, cp, _ = cp_models
    b, t = 2, 2
    batch = video_batch(rng, b, t)
    cot = jnp.asarray(
        np.random.RandomState(5).randn(b, t, SIZE // 8, SIZE // 8, K + 1)
        .astype(np.float32)
    )
    frames = jnp.asarray(batch["frames"])
    centers = jnp.asarray(batch["centers"])

    g_ref, _ = jax.jit(
        lambda p, fr, ce, ct: _pullback(
            base, calibrated, spec, p, fr, ce, ct, train=False
        )
    )(calibrated["params"], frames, centers, cot)

    mesh = make_video_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_clip_batch(batch, mesh)
    cot_s = jax.device_put(
        cot, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", "time"))
    )
    g_cp, _ = under_mesh(mesh, jax.jit(
        lambda p, fr, ce, ct: _pullback(
            cp, calibrated, spec, p, fr, ce, ct, train=False
        )
    ))(replicate(calibrated["params"], mesh), sharded["frames"],
       sharded["centers"], cot_s)

    medians = _median_ratio_per_group(g_ref, g_cp)
    assert set(medians) == {"backbone", "decoder", "head", "lstm", "lstm_0", "wasp"}
    for group, med in medians.items():
        assert abs(med - 1.0) < 2e-3, (
            f"{group}: median gradient ratio {med:.6f} — a systematic scale "
            "means a semantic sharding bug (missed/extra collective)"
        )


@pytest.mark.slow
def test_cp_train_vjp_within_conditioning_floor(rng, cp_models, calibrated):
    """Train-mode VJP (BN stat update + dropout) under the mesh lands within
    3x the function's own conditioning floor — the gradient distance a 1e-6
    relative input jitter produces on the UNSHARDED program.  In train mode
    that floor stays large even on calibrated stats (the jitter shifts BN
    batch statistics, and ReLU flips cascade through 101 layers); a
    sharding semantics bug (missed psum, per-shard BN stats) scales every
    entry by a device-count-level factor, far above any floor — the median
    blowup guard catches that decisively."""
    spec = tiny_spec()
    base, cp, _ = cp_models
    b, t = 2, 2
    batch = video_batch(rng, b, t)
    cot = jnp.asarray(
        np.random.RandomState(5).randn(b, t, SIZE // 8, SIZE // 8, K + 1)
        .astype(np.float32)
    )
    frames = jnp.asarray(batch["frames"])
    centers = jnp.asarray(batch["centers"])

    pull_ref = jax.jit(
        lambda p, fr, ce, ct: _pullback(
            base, calibrated, spec, p, fr, ce, ct, train=True
        )
    )
    g_ref, bs_ref = pull_ref(calibrated["params"], frames, centers, cot)
    # conditioning floor: same program, input jittered by 1e-6 relative
    noise = np.random.RandomState(11).randn(*batch["frames"].shape).astype(np.float32)
    g_jit, bs_jit = pull_ref(
        calibrated["params"], frames * (1 + 1e-6 * noise), centers, cot
    )

    mesh = make_video_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_clip_batch(batch, mesh)
    cot_s = jax.device_put(
        cot, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", "time"))
    )
    g_cp, bs_cp = under_mesh(mesh, jax.jit(
        lambda p, fr, ce, ct: _pullback(
            cp, calibrated, spec, p, fr, ce, ct, train=True
        )
    ))(replicate(calibrated["params"], mesh), sharded["frames"],
       sharded["centers"], cot_s)

    # no factor-level blowup anywhere (missed psum on 4 devices -> medians ~4)
    for group, med in _median_ratio_per_group(g_ref, g_cp).items():
        assert abs(med - 1.0) < 0.5, f"{group}: median ratio {med:.3f}"

    floor = _relmax_per_group(g_ref, g_jit)
    got = _relmax_per_group(g_ref, g_cp)
    for group in floor:
        assert got[group] <= 3 * floor[group] + 1e-6, (
            f"{group}: sharded rel diff {got[group]:.3e} above 3x jitter "
            f"floor {floor[group]:.3e} — likely a real sharding bug"
        )

    # BN batch stats: global over B*T in both programs (the one place a
    # per-shard-stats bug would show as a huge, not floor-level, diff).
    def bs_relmax(x, y):
        return max(
            float(np.abs(np.asarray(a) - np.asarray(c)).max()
                  / (np.abs(np.asarray(a)).max() + 1e-30))
            for a, c in zip(jax.tree_util.tree_leaves(x), jax.tree_util.tree_leaves(y))
        )

    assert bs_relmax(bs_ref, bs_cp) <= 3 * bs_relmax(bs_ref, bs_jit) + 1e-6


@pytest.mark.slow
def test_cp_train_step_loss_matches(rng, cp_models):
    """One full train step under a (2, 2) data x time mesh: the LOSS (a
    well-conditioned scalar, unlike the init-time gradients — module
    docstring) matches the unsharded step tightly, and the step runs end to
    end (BPTT through the scan + optimizer update) without error."""
    import optax

    from unipose_tpu.train.state import TrainState

    spec = tiny_spec()
    base, cp, variables = cp_models
    tx = optax.sgd(1e-3)

    def fresh_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.key(1),  # typed threefry: value-det under sharding
        )

    batch = video_batch(rng, 2, 2)

    step0 = make_train_step(base, tx, spec, video=True, donate=False)
    _, m_ref = step0(fresh_state(), {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_video_mesh(2, 2, devices=jax.devices()[:4])
    stepc = under_mesh(mesh, make_train_step(cp, tx, spec, video=True, donate=False))
    s_cp, m_cp = stepc(replicate(fresh_state(), mesh), shard_clip_batch(batch, mesh))

    np.testing.assert_allclose(float(m_cp["loss"]), float(m_ref["loss"]), rtol=1e-3)
    assert int(s_cp.step) == 1


def test_apply_time_parallel_configs():
    """--time_parallel resolves into (data, time) mesh + model spmd_axes;
    rejects the image arch; n=1 is a no-op."""
    from unipose_tpu.cli.train import apply_time_parallel
    from unipose_tpu.core.config import TrainConfig

    mc = ModelConfig(
        dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=4
    )
    tc = TrainConfig(batch_size=1)
    mc2, tc2 = apply_time_parallel(mc, tc, 4)
    assert mc2.spmd_axes == ("data", "time")
    assert tc2.mesh_shape == (-1, 4)
    assert tc2.mesh_axes == ("data", "time")
    assert apply_time_parallel(mc, tc, 1) == (mc, tc)
    with pytest.raises(SystemExit):
        apply_time_parallel(ModelConfig(variant="image"), tc, 2)


class _ListLoader:
    """Minimal loader protocol the Trainer needs (iter/len/set_epoch)."""

    def __init__(self, batches, batch_size):
        self.batches = batches
        self.batch_size = batch_size

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


@pytest.mark.slow
def test_trainer_cp_end_to_end(rng, tmp_path):
    """Production-path CP: a Trainer built with spmd_axes + a (2, 2) mesh
    runs a train epoch and a validation epoch with clips sharded over data
    AND each clip's frames sharded over time."""
    from unipose_tpu.core.config import TrainConfig
    from unipose_tpu.train.trainer import Trainer

    spec = tiny_spec()
    b, t = 2, 4
    batches = [video_batch(rng, b, t) for _ in range(2)]

    mc = ModelConfig(
        dataset="Penn_Action", num_classes=K, variant="lstm",
        frame_memory=t, spmd_axes=("data", "time"),
    )
    tc = TrainConfig(
        batch_size=b, lr=1e-3, val_batch_size=b,
        mesh_shape=(2, 2), mesh_axes=("data", "time"),
        model_name=str(tmp_path / "cp_best"),
    )
    trainer = Trainer(
        mc, tc, spec=spec,
        loaders=(_ListLoader(batches, b), _ListLoader(batches[:1], b)),
        log_every=1,
    )
    assert trainer.cp
    assert trainer.mesh.shape == {"data": 2, "time": 2}

    loss = trainer.training(0)
    assert np.isfinite(loss)
    mAP = trainer.validation(0)
    assert 0.0 <= mAP <= 1.0


def test_trainer_cp_mesh_mismatch_raises(rng):
    """spmd_axes without the matching mesh axes is a config error, caught at
    construction (not a silent no-constraint trace)."""
    from unipose_tpu.core.config import TrainConfig
    from unipose_tpu.train.trainer import Trainer

    mc = ModelConfig(
        dataset="Penn_Action", num_classes=K, variant="lstm",
        frame_memory=2, spmd_axes=("data", "time"),
    )
    with pytest.raises(ValueError, match="spmd_axes"):
        Trainer(mc, TrainConfig(batch_size=1), spec=tiny_spec(),
                loaders=(None, None))


def test_cp_streaming_state_carries_under_time_sharding(rng, cp_models):
    """Chunked streaming eval (initial_state path) composes with time
    sharding: two sharded chunks with carried state == one unsharded pass."""
    spec = tiny_spec()
    base, cp, variables = cp_models
    t = 8
    batch = video_batch(rng, 1, t)

    want = np.asarray(
        jax.jit(lambda v, bt: forward(base, v, bt, spec))(variables, batch)
    )

    mesh = make_video_mesh(1, 4, devices=jax.devices()[:4])
    vrep = replicate(variables, mesh)

    @jax.jit
    def chunk_step(v, frames, centers, state):
        x = preprocess_images(frames)
        cm = make_centermaps(centers, spec)
        kwargs = {} if state is None else {"initial_state": state}
        heat, inter = cp.apply(
            v, x, cm, train=False, mutable=["intermediates"], **kwargs
        )
        return heat, inter["intermediates"]["final_state"][0]

    outs = []
    state = None
    with jax.set_mesh(mesh):
        for start in (0, 4):
            fr = jax.device_put(
                jnp.asarray(batch["frames"][:, start : start + 4]),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", "time")),
            )
            ce = jnp.asarray(batch["centers"][:, start : start + 4])
            heat, state = chunk_step(vrep, fr, ce, state)
            outs.append(np.asarray(heat))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_apply_time_parallel_validates_divisibility(eight_devices):
    """--time_parallel must divide both the device count and frame_memory
    (ADVICE r3: 8 chips with --time_parallel 3 silently trained on 6)."""
    from unipose_tpu.cli.train import apply_time_parallel

    mc = ModelConfig(
        dataset="Penn_Action", num_classes=13, variant="lstm", frame_memory=5
    )
    tc = TrainConfig(batch_size=1)
    with pytest.raises(SystemExit, match="device count"):
        apply_time_parallel(mc, tc, 3)  # 8 % 3 != 0
    with pytest.raises(SystemExit, match="frame_memory"):
        apply_time_parallel(mc, tc, 4)  # 5 % 4 != 0
    mc4 = dataclasses.replace(mc, frame_memory=4)
    mc2, tc2 = apply_time_parallel(mc4, tc, 4)
    assert tc2.mesh_shape == (-1, 4)


def test_shard_clip_batch_low_rank_leaves_shard_data_only(eight_devices):
    """Leaves with ndim < 3 cannot be (B, T, ...) clip tensors; they shard
    over 'data' only (a (B, features) leaf must never have its feature dim
    spread over 'time' — ADVICE r3)."""
    mesh = make_video_mesh(2, 4)
    batch = {
        "frames": np.zeros((2, 4, 8, 8, 3), np.float32),
        "centers": np.zeros((2, 4, 2), np.float32),
        "clip_label": np.zeros((2, 6), np.float32),
        "paths": ["a", "b"],
    }
    out = shard_clip_batch(batch, mesh)
    assert out["frames"].sharding.spec == P("data", "time")
    assert out["centers"].sharding.spec == P("data", "time")
    assert out["clip_label"].sharding.spec == P("data")
    assert out["paths"] == ["a", "b"]
