"""GSPMD sync-BN semantics: batch statistics computed under a sharded batch
equal the unsharded global-batch statistics (what the reference's ignored
sync_bn=True flag was supposed to mean — SURVEY §2.2)."""

import numpy as np

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
