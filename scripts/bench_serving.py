"""Serving latency of the exported StableHLO artifact at batch 1.

The reference's demo path runs one image at a time through the torch model
(Reference: unipose.py:197-246); the deployment equivalent here is the
``jax.export`` StableHLO artifact (unipose_tpu/compat/export.py) with weights
baked in.  This measures:
  * device step latency of the loaded artifact, batch 1 (chained-in-jit —
    the per-call tunnel round trip in this environment is ~24 ms and would
    swamp a naive wall-clock loop), and
  * the same for the live jitted model as a sanity cross-check (the artifact
    should not be slower than the model it was exported from).

Prints one JSON line. Usage: python scripts/bench_serving.py [--size 368]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import chained_timer, zeros_variables  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument(
        "--batches", default="",
        help="comma-separated extra batch sizes to sweep (micro-batched "
        "serving latency, e.g. 2,4,8); each is its own exported artifact",
    )
    p.add_argument(
        "--int8", action="store_true",
        help="bake the w8a8 int8 front end into the artifacts "
        "(cli/export --int8_frontend equivalent)",
    )
    args = p.parse_args()

    from unipose_tpu.compat.export import export_inference, load_inference
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import build_model

    size = args.size
    config = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(config)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = zeros_variables(model, x0)

    def make_forward(batch):
        """None for the default path; the int8-front-end forward with --int8."""
        if not args.int8:
            return None
        from unipose_tpu.models.quantized import int8_forward_fn

        calib = (
            jax.random.uniform(jax.random.PRNGKey(0), (batch, size, size, 3))
            * 255.0
            - 128.0
        ) / 256.0
        _, forward = int8_forward_fn(variables, calib, num_classes=14)
        return forward

    blob = export_inference(
        model, variables, (1, size, size, 3), forward=make_forward(1)
    )
    call = load_inference(blob)
    x = jax.device_put(
        np.random.RandomState(0).rand(1, size, size, 3).astype(np.float32)
    )

    def art_step(carry):
        out = call(x + carry * 0.0)
        return out.astype(jnp.float32).sum()

    def live_step(carry):
        out = model.apply(variables, x + carry * 0.0, train=False)
        return out.astype(jnp.float32).sum()

    t_art = chained_timer(art_step, args.iters)
    t_live = chained_timer(live_step, args.iters)

    # micro-batched serving (cli/serve.py MicroBatcher groups concurrent
    # requests up to the artifact's baked batch): latency per CALL at batch N
    sweep = {}
    for b in [int(v) for v in args.batches.split(",") if v]:
        blob_b = export_inference(
            model, variables, (b, size, size, 3), forward=make_forward(b)
        )
        call_b = load_inference(blob_b)
        xb = jax.device_put(
            np.random.RandomState(b).rand(b, size, size, 3).astype(np.float32)
        )

        def step_b(carry):
            out = call_b(xb + carry * 0.0)
            return out.astype(jnp.float32).sum()

        t_b = chained_timer(step_b, args.iters)
        sweep[str(b)] = {
            "ms_per_call": round(t_b * 1e3, 3),
            "ms_per_frame": round(t_b * 1e3 / b, 3),
        }

    print(
        json.dumps(
            {
                "metric": "serving_latency_batch1"
                + ("_int8" if args.int8 else ""),
                "value": round(t_art * 1e3, 3),
                "unit": "ms/frame (device step, chained)",
                "live_jit_ms": round(t_live * 1e3, 3),
                "artifact_bytes": len(blob),
                "input": [1, size, size, 3],
                "batch_sweep": sweep,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
