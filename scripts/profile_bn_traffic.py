"""Closing the train-step book (VERDICT r3 next-round #7): is the BN-train
cost — the measured 12.2 ms gap between the production step (68.6 ms) and
the freeze_bn step (60.2 ms ≈ the semantic ceiling) — at the HBM bandwidth
roof, i.e. is there anything left for a Pallas BN kernel to win?

Method:
  1. analytic traffic budget: torch-semantics train BN costs, vs frozen BN,
     ~3 extra passes over each BN-governed activation tensor (fwd: read x
     for the batch moments; bwd: read x again for x-hat and read dy for the
     dgamma/dbeta/mean terms — frozen BN's backward is a pure elementwise
     scale that fuses into neighbors for free).  Enumerate every BN shape
     in the 368² batch-32 image model, sum bytes, divide by the v5e HBM
     roof (~819 GB/s).
  2. measured per-shape microbench: chained-in-jit train-mode BN
     forward+backward at the model's three dominant shape classes ->
     achieved GB/s vs roof.

If (1) ~= the measured 12.2 ms and (2) sits near the known standalone-
reduction ceiling, the gap is semantic traffic, not scheduling waste — a
Pallas kernel could only win by fusing across the conv boundary, which is
exactly what freeze_bn already removes at the semantics level.

Usage: python scripts/profile_bn_traffic.py [--batch 32] [--size 368]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HBM_GBPS = 819.0  # v5e HBM peak


def bn_shapes(batch: int, size: int):
    """Every TorchBatchNorm call in the image model at (batch, size):
    (H, W, C, count) — ResNet101 stem + bottleneck stages (models/resnet.py),
    WASP (models/wasp.py), decoder (models/decoder.py)."""
    s = size // 8  # 46 at 368
    shapes = []
    # stem: conv1 bn at stride 2
    shapes.append((size // 2, size // 2, 64, 1))
    # layer1 @ stride 4: 3 bottlenecks (64, 64, 256) + downsample 256
    q = size // 4
    shapes += [(q, q, 64, 6), (q, q, 256, 3), (q, q, 256, 1)]
    # layer2 @ stride 8: 4 bottlenecks (128, 128, 512) + downsample
    shapes += [(s, s, 128, 8), (s, s, 512, 4), (s, s, 512, 1)]
    # layer3 @ stride 16: 23 bottlenecks (256, 256, 1024) + downsample
    e = size // 16
    shapes += [(e, e, 256, 46), (e, e, 1024, 23), (e, e, 1024, 1)]
    # layer4 (dilated, stride 16): 3 blocks (512, 512, 2048) + downsample
    shapes += [(e, e, 512, 6), (e, e, 2048, 3), (e, e, 2048, 1)]
    # WASP: 4 atrous branches 256 @ e², gap bn 256 @ 1², conv1 bn 256 @ e²
    shapes += [(e, e, 256, 5), (1, 1, 256, 1)]
    # decoder: low-level 48 @ q², two head BNs 256 @ s²
    shapes += [(q, q, 48, 1), (s, s, 256, 2)]
    return shapes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--backend", default=None, choices=[None, "cpu"])
    args = p.parse_args()
    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(1)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import jax.numpy as jnp

    from bench import chained_timer
    from unipose_tpu.models.layers import TorchBatchNorm

    b = args.batch

    # ---------------- analytic budget ----------------
    total_elems = sum(h * w * c * n for h, w, c, n in bn_shapes(b, args.size)) * b
    bytes_bf16 = total_elems * 2
    passes = 3.0  # fwd stat read + bwd x-hat read + bwd dy read
    t_analytic_ms = passes * bytes_bf16 / (HBM_GBPS * 1e9) * 1e3
    print(
        f"BN-governed activations: {total_elems / 1e9:.2f} G elements "
        f"({bytes_bf16 / 1e9:.2f} GB bf16); {passes:.0f} extra passes "
        f"=> analytic {t_analytic_ms:.1f} ms at {HBM_GBPS:.0f} GB/s roof"
    )

    # ---------------- measured per-shape microbench ----------------
    bn = TorchBatchNorm()
    results = []
    rep_shapes = [
        (args.size // 4, args.size // 4, 64),    # layer1-class (big spatial)
        (args.size // 8, args.size // 8, 512),   # layer2-class
        (args.size // 16, args.size // 16, 1024),  # layer3-class (channel-heavy)
    ]
    for h, w, c in rep_shapes:
        x0 = jnp.ones((b, h, w, c), jnp.bfloat16) * 0.5
        variables = bn.init(jax.random.PRNGKey(0), x0, use_running_average=False)

        def loss(x):
            y, _ = bn.apply(
                variables, x, use_running_average=False, mutable=["batch_stats"]
            )
            return jnp.sum(y.astype(jnp.float32) * 1e-6)

        grad = jax.grad(loss)

        def step_scalar(carry):
            # carry (scalar) perturbs the input so iterations chain; the
            # returned scalar depends on the full backward.
            x = x0 + carry.astype(x0.dtype) * 0.0
            g = grad(x)
            return jnp.sum(g.astype(jnp.float32)) * 1e-20 + carry * 0.0

        t = chained_timer(step_scalar, args.iters)
        # traffic of train fwd+bwd: fwd read x + write y; bwd read dy
        # (here: produced on-chip, generously counted), read x, write dx
        bytes_moved = 4 * x0.size * 2  # conservative: x read 2x, y+dx written
        gbps = bytes_moved / t / 1e9
        results.append(
            {"shape": [b, h, w, c], "ms": round(t * 1e3, 3),
             "achieved_GBps": round(gbps, 1),
             "pct_roof": round(100 * gbps / HBM_GBPS, 1)}
        )
        print(results[-1])

    print(json.dumps({
        "metric": "bn_train_traffic",
        "analytic_ms_at_roof": round(t_analytic_ms, 1),
        "measured_gap_ms": 12.2,
        "per_shape": results,
    }))


if __name__ == "__main__":
    main()
