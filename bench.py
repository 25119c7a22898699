"""Benchmark: UniPose image-model inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N, ...}

Measurement: steady-state forward at 368x368 (compile excluded), bf16
compute / f32 heatmap output, NHWC, best over a small batch sweep — the
flagship config (BASELINE.json: frames/sec/chip at 368x368).

``vs_baseline`` compares against an A100 estimate for the PyTorch reference,
since the reference repo publishes no numbers (BASELINE.md): UniPose
ResNet-101+WASP is ~30 GFLOPs/frame forward; PyTorch fp32 w/ cudnn.benchmark
on A100 sustains roughly 10 TFLOP/s on this conv mix => ~300 frames/s. The
north-star target is 5x that (1500 f/s/chip), reported as ``vs_target``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the first bench run pays compile, reruns don't.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_FPS_ESTIMATE = 300.0
TARGET_MULTIPLE = 5.0


def zeros_variables(model, *sample_args, **kwargs):
    """Zero-valued variables via eval_shape — no init program to compile.

    Param values are irrelevant for throughput measurement, and this skips a
    multi-minute remote compile of the init graph (the persistent compile
    cache does not survive across processes on this backend).
    """
    kwargs.setdefault("train", False)
    shapes = jax.eval_shape(
        lambda k, *a: model.init(k, *a, **kwargs),
        jax.random.PRNGKey(0),
        *sample_args,
    )
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def chained_timer(step_scalar_fn, iters: int):
    """Time ``iters`` executions chained inside ONE compiled program.

    Through this environment's remote-device tunnel, ``block_until_ready``
    can return before device completion on large outputs, and a forced sync
    (scalar fetch) costs a ~24 ms round trip — both corrupt per-call timing.
    Chaining iterations inside a single jit with a data dependency (the
    previous iteration's scalar feeds the next input; ``carry * 0.0`` is not
    algebraically folded for floats) measures true device throughput with a
    single round trip amortized over all iterations.
    """

    @jax.jit
    def loop():
        def body(i, carry):
            return step_scalar_fn(carry)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop())  # compile + warm
    t0 = time.perf_counter()
    float(loop())  # the scalar fetch is the single synchronization point
    dt = time.perf_counter() - t0
    return dt / iters


def chained_timer_stateful(step_fn, state, batch, iters: int, *, image_key="image"):
    """``chained_timer`` for stateful (state, batch) -> (state, metrics) steps.

    Iterations are chained inside one compiled program by threading the state
    and the previous iteration's loss scalar through a ``fori_loop``; the
    batch's image leaf is perturbed by ``loss * 0.0`` so XLA can neither hoist
    nor parallelize iterations.  One scalar fetch is the only sync point.
    NOT for donating steps (fori_loop can't express buffer donation across
    its body) — time those per-call with a trailing scalar fetch instead
    (scripts/profile_train_variants2.py::timed_donating).
    """

    @jax.jit
    def loop(state, batch):
        def body(i, carry):
            st, tick = carry
            b = dict(batch, **{image_key: batch[image_key] + tick * 0.0})
            st, metrics = step_fn(st, b)  # a nested jit inlines
            return st, metrics["loss"].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    out = loop(state, batch)
    jax.block_until_ready(out)
    float(out[1])  # drain any straggling transfer
    t0 = time.perf_counter()
    out = loop(state, batch)
    float(out[1])
    return (time.perf_counter() - t0) / iters


def bench_forward(batch_sizes=(32,), iters=20):
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import build_model

    config = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(config)
    x0 = jnp.zeros((1, 368, 368, 3), jnp.float32)
    variables = zeros_variables(model, x0)

    results = {}
    for b in batch_sizes:
        x = jax.device_put(
            np.random.RandomState(0).rand(b, 368, 368, 3).astype(np.float32)
        )

        def step(carry):
            out = model.apply(variables, x + carry * 0.0, train=False)
            return out.astype(jnp.float32).sum()

        try:
            dt = chained_timer(step, iters)
            results[b] = b / dt
        except Exception:  # OOM at large batch etc.
            results[b] = None
    return results


def bench_video(batch=4, t_frames=5, iters=10, warmup=2):
    """UniPose-LSTM 5-frame clip inference (BASELINE metric: video fps)."""
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import build_model

    config = ModelConfig(
        dataset="Penn_Action",
        num_classes=13,
        variant="lstm",
        frame_memory=t_frames,
        compute_dtype=jnp.bfloat16,
    )
    model = build_model(config)
    f0 = jnp.zeros((1, t_frames, 368, 368, 3), jnp.float32)
    c0 = jnp.zeros((1, t_frames, 368, 368, 1), jnp.float32)
    variables = zeros_variables(model, f0, c0)

    rng = np.random.RandomState(0)
    f = jax.device_put(rng.rand(batch, t_frames, 368, 368, 3).astype(np.float32))
    c = jax.device_put(rng.rand(batch, t_frames, 368, 368, 1).astype(np.float32))

    def step(carry):
        out = model.apply(variables, f + carry * 0.0, c, train=False)
        return out.astype(jnp.float32).sum()

    dt = chained_timer(step, iters)
    return batch * t_frames / dt


def bench_train(batch=32, iters=10):
    """Image train-step throughput (fwd+bwd+Adam, on-device targets),
    chained-in-jit like the inference metric."""
    from unipose_tpu.core.config import ModelConfig, TrainConfig, DATASETS
    from unipose_tpu.models.unipose import build_model
    from unipose_tpu.train.optim import make_optimizer
    from unipose_tpu.train.state import TrainState
    from unipose_tpu.train.steps import make_train_step

    spec = DATASETS["LSP"]
    config = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(config)
    x0 = jnp.zeros((1, 368, 368, 3), jnp.float32)
    variables = zeros_variables(model, x0)
    tx = make_optimizer(TrainConfig(batch_size=batch))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(0)
    batch_data = {
        "image": jax.device_put(
            rng.rand(batch, 368, 368, 3).astype(np.float32) * 255
        ),
        "kpts": jax.device_put(
            np.concatenate(
                [rng.rand(batch, 14, 2) * 368, np.ones((batch, 14, 1))], axis=-1
            ).astype(np.float32)
        ),
    }
    step = make_train_step(model, tx, spec, donate=False)
    dt = chained_timer_stateful(step, state, batch_data, iters)
    return batch / dt


def main():
    full = "--full" in sys.argv
    dev = jax.devices()[0]
    results = bench_forward(batch_sizes=(8, 16, 32, 64) if full else (32,))
    valid = {b: f for b, f in results.items() if f}
    best_batch, best_fps = max(valid.items(), key=lambda kv: kv[1])
    record = {
        "metric": "unipose_image_inference_368",
        "value": round(best_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best_fps / A100_REFERENCE_FPS_ESTIMATE, 3),
        "baseline_basis": (
            "ESTIMATE — reference repo publishes no numbers; "
            "A100 ~300 f/s derived in BASELINE.md / docs/BENCHMARKS.md"
        ),
        "vs_target": round(
            best_fps / (TARGET_MULTIPLE * A100_REFERENCE_FPS_ESTIMATE), 3
        ),
        "batch": best_batch,
        "sweep": {str(b): (round(f, 2) if f else None) for b, f in results.items()},
        "device": str(dev.device_kind),
        "dtype": "bfloat16",
    }
    if full:
        try:
            record["video_fps_5frame"] = round(bench_video(), 2)
        except Exception as e:
            record["video_fps_5frame"] = f"error: {e}"
        try:
            record["train_fps_batch32"] = round(bench_train(), 2)
        except Exception as e:
            record["train_fps_batch32"] = f"error: {e}"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
