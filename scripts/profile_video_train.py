"""Video train-step ceiling study (VERDICT r4 weak #2 / next-round #3).

The image step got a model-grade closing argument (profile_train.py +
profile_bn_traffic.py: 467 f/s within a proven 13% of the 531 f/s
freeze_bn semantic ceiling, the gap == measured BN-train traffic at the
bandwidth roof).  This script decomposes the VIDEO step (B8xT5 at 368²,
round-4 headline 367 f/s = 108.9 ms) the same way:

  full            the production video train step (fwd + bwd + Adam)
  freeze_bn       same with BN frozen to running stats -> the BN-train
                  traffic delta == the image study's semantic-ceiling gap
  fwd_train       train-mode forward only
  vag             forward + backward (no optimizer) -> backward share
  tower           standalone ResNet101+WASP(video)+Decoder fwd/bwd over the
                  same B*T frames -> the carry-independent tower's share
  scan_head       ConvLSTM0 + scanned ConvLSTMCell + 11x11 head fwd/bwd on
                  precomputed (T, B, h8, w8, K+2) features -> the
                  recurrence + head share
  head            the 11x11 LSTMHead alone over B*T -> isolates the scan
                  (scan_head - head ~= ConvLSTM cells)
  data_prep       preprocess + Gaussian targets + centermaps (device-side)

Sum(tower, scan_head, data_prep) + optimizer overhead should reconstruct
``vag``/``full`` to within measurement noise — whatever residual remains is
scheduling/fusion loss, and freeze_bn bounds what a BN kernel could win.
All timings chained-in-jit (bench.chained_timer*).

Usage (TPU): python scripts/profile_video_train.py [--batch 8] [--t 5]
Prints one JSON line.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

from flax import linen as nn  # noqa: E402

from bench import chained_timer, chained_timer_stateful, zeros_variables  # noqa: E402
from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig  # noqa: E402
from unipose_tpu.models.decoder import Decoder  # noqa: E402
from unipose_tpu.models.resnet import ResNet101  # noqa: E402
from unipose_tpu.models.unipose import build_model  # noqa: E402
from unipose_tpu.models.unipose_lstm import (  # noqa: E402
    ConvLSTM0,
    ConvLSTMCell,
    LSTMHead,
)
from unipose_tpu.models.wasp import WASP  # noqa: E402
from unipose_tpu.train.optim import make_optimizer  # noqa: E402
from unipose_tpu.train.state import TrainState  # noqa: E402
from unipose_tpu.train.steps import (  # noqa: E402
    make_centermaps,
    make_targets,
    make_train_step,
    preprocess_images,
)


class TowerOnly(nn.Module):
    """The carry-independent per-frame tower of UniPoseLSTM
    (models/unipose_lstm.py __call__ backbone/wasp/decoder section)."""

    num_classes: int = 13
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats, low = ResNet101(dtype=self.dtype, name="backbone")(x, train=train)
        y = WASP(gap_batchnorm=False, dtype=self.dtype, name="wasp")(
            feats, train=train
        )
        return Decoder(self.num_classes, dtype=self.dtype, name="decoder")(
            y, low, train=train
        )


class ScanHead(nn.Module):
    """The recurrence + head of UniPoseLSTM on precomputed features z
    (T, B, h8, w8, K+2)."""

    num_classes: int = 13
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        lstm_ch = self.num_classes + 2
        cell0, hide0 = ConvLSTM0(lstm_ch, dtype=self.dtype, name="lstm_0")(z[0])
        scanned = nn.scan(
            ConvLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=0,
            out_axes=0,
        )(lstm_ch, dtype=self.dtype, name="lstm")
        (c, h), hides = scanned(
            (cell0.astype(jnp.float32), hide0.astype(jnp.float32)), z[1:]
        )
        hides = jnp.concatenate([hide0[None].astype(hides.dtype), hides], 0)
        t, b, h8, w8, _ = hides.shape
        flat = jnp.moveaxis(hides, 0, 1).reshape(t * b, h8, w8, lstm_ch)
        return LSTMHead(self.num_classes + 1, dtype=self.dtype, name="head")(flat)


def zeros_vars_nokw(model, *sample_args):
    """zeros_variables for modules without a ``train`` kwarg."""
    shapes = jax.eval_shape(
        lambda k, *a: model.init(k, *a), jax.random.PRNGKey(0), *sample_args
    )
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _consume_grads(val, g):
    """Fold every grad leaf into the chained scalar so XLA cannot
    dead-code-eliminate the weight-grad matmuls (profile_train.py does the
    same via a gnorm sum; consuming a single leaf lets XLA prune all other
    dW computations and understates the backward by tens of ms)."""
    gnorm = sum(
        jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        for leaf in jax.tree_util.tree_leaves(g)
    )
    return val + gnorm * 0.0


def timed_vag(model_apply, variables, x_args, iters):
    """fwd+bwd of mean(out^2), chained; perturbs the first input."""

    def loss(params, *a):
        out = model_apply({**variables, "params": params}, *a)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    grad_fn = jax.value_and_grad(loss)

    def step(carry):
        a0 = x_args[0] + carry * 0.0
        val, g = grad_fn(variables["params"], a0, *x_args[1:])
        return _consume_grads(val, g)

    return chained_timer(step, iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--t", type=int, default=5)
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backend", default=None, choices=[None, "cpu"])
    args = p.parse_args()
    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(1)
    b, t, size = args.batch, args.t, args.size
    import dataclasses

    spec = dataclasses.replace(DATASETS["Penn_Action"], input_size=size)
    h8 = size // 8
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(b, t, size, size, 3), jnp.float32) * 255
    kpts = jnp.asarray(rng.rand(b, t, 13, 3), jnp.float32) * h8 * 8
    centers = jnp.full((b, t, 2), size / 2.0, jnp.float32)
    batch = {"frames": frames, "kpts": kpts, "centers": centers}
    results = {"batch": b, "t": t, "size": size}

    def full_step_ms(freeze_bn):
        mc = ModelConfig(
            dataset="Penn_Action", num_classes=13, variant="lstm",
            frame_memory=t, compute_dtype=jnp.bfloat16, freeze_bn=freeze_bn,
        )
        model = build_model(mc)
        variables = zeros_variables(
            model,
            jnp.zeros((1, t, size, size, 3), jnp.float32),
            jnp.zeros((1, t, size, size, 1), jnp.float32),
        )
        tx = make_optimizer(TrainConfig(batch_size=b))
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.int32(0),
            rng=jax.random.PRNGKey(0),
        )
        step = make_train_step(model, tx, spec, video=True, donate=False)
        dt = chained_timer_stateful(
            step, state, batch, args.iters, image_key="frames"
        )
        return dt * 1e3, model, variables

    results["full_ms"], model, variables = full_step_ms(False)
    results["freeze_bn_ms"], _, _ = full_step_ms(True)
    print(f"full {results['full_ms']:.1f} ms / freeze_bn "
          f"{results['freeze_bn_ms']:.1f} ms", flush=True)

    # forward-only (train mode) and fwd+bwd (no optimizer)
    x = preprocess_images(frames).astype(jnp.bfloat16)
    cms = make_centermaps(centers, spec)

    def fwd_train(carry):
        out, _ = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x + carry * 0.0, cms, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return out.reshape(-1)[0].astype(jnp.float32)

    results["fwd_train_ms"] = chained_timer(fwd_train, args.iters) * 1e3

    def vag_loss(params, xx):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xx, cms, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    vag_grad = jax.value_and_grad(vag_loss)

    def vag_step(carry):
        val, g = vag_grad(variables["params"], x + carry * 0.0)
        return _consume_grads(val, g)

    results["vag_ms"] = chained_timer(vag_step, args.iters) * 1e3
    print(f"fwd {results['fwd_train_ms']:.1f} ms / vag "
          f"{results['vag_ms']:.1f} ms", flush=True)

    # tower share: same B*T frames through backbone/wasp/decoder
    tower = TowerOnly()
    xt = x.reshape(b * t, size, size, 3)
    tw_vars = zeros_variables(tower, xt[:1])
    results["tower_vag_ms"] = timed_vag(
        lambda v, xx: tower.apply(
            v, xx, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        ),
        tw_vars, (xt,), args.iters,
    ) * 1e3
    print(f"tower {results['tower_vag_ms']:.1f} ms", flush=True)

    # recurrence + head share on precomputed features
    sh = ScanHead()
    z = jnp.zeros((t, b, h8, h8, 15), jnp.bfloat16)
    sh_vars = zeros_vars_nokw(sh, z)
    results["scan_head_vag_ms"] = timed_vag(
        lambda v, zz: sh.apply(v, zz), sh_vars, (z,), args.iters
    ) * 1e3

    # the 11x11 head alone over B*T
    head = LSTMHead(14, dtype=jnp.bfloat16)
    hx = jnp.zeros((b * t, h8, h8, 15), jnp.bfloat16)
    hd_vars = zeros_vars_nokw(head, hx)
    results["head_vag_ms"] = timed_vag(
        lambda v, xx: head.apply(v, xx), hd_vars, (hx,), args.iters
    ) * 1e3
    print(f"scan_head {results['scan_head_vag_ms']:.1f} ms / head "
          f"{results['head_vag_ms']:.1f} ms", flush=True)

    # device-side data prep
    def prep(carry):
        xx = preprocess_images(frames + carry * 0.0)
        tg = make_targets(kpts, spec)
        cm = make_centermaps(centers, spec)
        return (
            xx.reshape(-1)[0] + tg.reshape(-1)[0] + cm.reshape(-1)[0]
        ).astype(jnp.float32)

    results["data_prep_ms"] = chained_timer(prep, args.iters) * 1e3

    # derived shares
    results["bwd_share_ms"] = round(results["vag_ms"] - results["fwd_train_ms"], 2)
    results["optimizer_glue_ms"] = round(results["full_ms"] - results["vag_ms"], 2)
    results["bn_traffic_ms"] = round(
        results["full_ms"] - results["freeze_bn_ms"], 2
    )
    results["scan_only_ms"] = round(
        results["scan_head_vag_ms"] - results["head_vag_ms"], 2
    )
    results["component_sum_ms"] = round(
        results["tower_vag_ms"] + results["scan_head_vag_ms"]
        + results["data_prep_ms"], 2
    )
    results["frames_per_s"] = round(b * t / (results["full_ms"] / 1e3), 1)
    results["ceiling_frames_per_s"] = round(
        b * t / (results["freeze_bn_ms"] / 1e3), 1
    )
    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
