"""GSPMD sync-BN semantics: batch statistics computed under a sharded batch
equal the unsharded global-batch statistics (what the reference's ignored
sync_bn=True flag was supposed to mean — SURVEY §2.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unipose_tpu.models.layers import TorchBatchNorm
from unipose_tpu.parallel.mesh import batch_sharding, make_mesh, replicate


def test_sharded_batch_stats_match_global(rng, eight_devices):
    c = 16
    x = rng.randn(16, 6, 6, c).astype(np.float32)
    bn = TorchBatchNorm()
    variables = bn.init(
        jax.random.PRNGKey(0), jnp.asarray(x[:2]), use_running_average=False
    )

    # unsharded global-batch stats
    _, want = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )

    mesh = make_mesh((8,), ("data",))
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = replicate(variables, mesh)

    @jax.jit
    def step(v, x):
        return bn.apply(v, x, use_running_average=False, mutable=["batch_stats"])

    out, got = step(vs, xs)
    np.testing.assert_allclose(
        np.asarray(got["batch_stats"]["running_mean"]),
        np.asarray(want["batch_stats"]["running_mean"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_stats"]["running_var"]),
        np.asarray(want["batch_stats"]["running_var"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_axis_name_pmean_under_shard_map(rng, eight_devices):
    """The explicit-collective path (shard_map + lax.pmean via axis_name)
    also reproduces global stats."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    c = 8
    x = rng.randn(8, 4, 4, c).astype(np.float32)
    bn_sync = TorchBatchNorm(axis_name="data")
    bn_plain = TorchBatchNorm()
    variables = bn_plain.init(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]), use_running_average=False
    )
    _, want = bn_plain.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )

    mesh = make_mesh((8,), ("data",))

    def per_shard(v, xs):
        out, upd = bn_sync.apply(
            v, xs, use_running_average=False, mutable=["batch_stats"]
        )
        return upd["batch_stats"]["running_mean"], upd["batch_stats"]["running_var"]

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
    )
    got_mean, got_var = fn(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_mean),
        np.asarray(want["batch_stats"]["running_mean"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got_var),
        np.asarray(want["batch_stats"]["running_var"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_dp_step_matches_single_device(rng, eight_devices):
    """One GSPMD data-parallel train step over 8 devices produces the same
    updated params as the identical step on one device (grad all-reduce +
    global BN statistics are exact, not approximate)."""
    import dataclasses

    from unipose_tpu.core.config import DATASETS, TrainConfig
    from unipose_tpu.models.layers import Conv, TorchBatchNorm
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState
    from unipose_tpu.train.steps import make_train_step
    from unipose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from flax import linen as nn
    import jax.numpy as jnp

    SIZE = 32

    class TinyPose(nn.Module):
        """Minimal conv+BN net with the (B,H,W,3)->(B,H/8,W/8,K+1) contract."""

        @nn.compact
        def __call__(self, x, *, train=False):
            x = Conv(8, 3, stride=2, padding=1, name="c1")(x)
            x = TorchBatchNorm(name="b1")(x, use_running_average=not train)
            x = nn.relu(x)
            x = Conv(8, 3, stride=2, padding=1, name="c2")(x)
            x = nn.relu(x)
            return Conv(15, 3, stride=2, padding=1, use_bias=True, name="c3")(x)

    spec = dataclasses.replace(DATASETS["LSP"], input_size=SIZE)
    model = TinyPose()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    tx = make_optimizer(TrainConfig(lr=1e-3))

    def fresh():
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(1),
        )

    batch_np = {
        "image": rng.rand(8, SIZE, SIZE, 3).astype(np.float32) * 255,
        "kpts": np.concatenate(
            [rng.rand(8, 14, 2) * SIZE, np.ones((8, 14, 1))], -1
        ).astype(np.float32),
    }
    step = make_train_step(model, tx, spec, donate=False)

    s_single, m_single = step(
        fresh(), {k: jnp.asarray(v) for k, v in batch_np.items()}
    )

    mesh = make_mesh((8,), ("data",))
    s_dp, m_dp = step(replicate(fresh(), mesh), shard_batch(dict(batch_np), mesh))

    assert float(m_single["loss"]) == pytest.approx(float(m_dp["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_single.params),
        jax.tree_util.tree_leaves(s_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_single.batch_stats),
        jax.tree_util.tree_leaves(s_dp.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
