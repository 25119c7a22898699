"""Streaming-video-artifact latency: per-chunk device step of the exported
chunk-program pair (cli/export --stream) at the production shape.

Long-video serving runs init once then cont per chunk; cont is the steady
state, so that's the headline.  Chained-in-jit timing is not possible across
an Exported.call boundary with state threading, so this uses the state
data-dependence itself as the chain: chunk i+1 consumes chunk i's (cell,
hide), serialized by construction; one sync at the end.

Usage: python scripts/bench_stream.py [--t 5] [--size 368] [--chunks 40]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import zeros_variables  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=5)
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--chunks", type=int, default=40)
    args = p.parse_args()
    t, size = args.t, args.size

    from unipose_tpu.compat.export import export_video_stream, load_video_stream
    from unipose_tpu.models.unipose_lstm import UniPoseLSTM

    model = UniPoseLSTM(num_classes=13, dtype=jnp.bfloat16)
    frames, cm = jax.jit(
        lambda k: (
            jax.random.uniform(k, (1, t, size, size, 3)),
            jax.random.uniform(jax.random.fold_in(k, 1), (1, t, size, size, 1)),
        )
    )(jax.random.PRNGKey(0))
    variables = zeros_variables(model, frames[:, :1], cm[:, :1])

    blob = export_video_stream(model, variables, (1, t, size, size, 3))
    init_exp, cont_exp = load_video_stream(blob)

    # warm both programs
    heat, cell, hide = init_exp.call(frames, cm)
    heat, cell, hide = cont_exp.call(frames, cm, cell, hide)
    jax.block_until_ready(heat)

    def run(n):
        """n cont chunks, chained by the state data-dependence."""
        h, c, hd = init_exp.call(frames, cm)
        for _ in range(n):
            h, c, hd = cont_exp.call(frames, cm, c, hd)
        return float(jnp.sum(c))  # scalar fetch = the one sync

    run(2)  # warm dispatch path
    t0 = time.perf_counter()
    run(args.chunks)
    dt = time.perf_counter() - t0
    per_chunk = dt / (args.chunks + 1)
    print(
        json.dumps(
            {
                "metric": "video_stream_chunk_latency",
                "value": round(per_chunk * 1e3, 3),
                "unit": f"ms per {t}-frame chunk (state-chained)",
                "frames_per_sec": round(t / per_chunk, 1),
                "chunk": [1, t, size, size, 3],
                "artifact_bytes": len(blob),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
