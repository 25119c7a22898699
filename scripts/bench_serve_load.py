"""Serving under load: concurrent HTTP clients against the real server
(cli/serve.py — ThreadingHTTPServer + MicroBatcher) -> sustained req/s and
latency percentiles (VERDICT r3 next-round #6: a documented max-throughput
number from a concurrent-client bench).

End-to-end path per request: HTTP -> JPEG decode -> resize -> micro-batch
coalescing -> device call -> argmax -> JSON.  On this box the host side is
1 vCPU, so decode/resize of concurrent clients contends with dispatch — the
measured number is a whole-system figure, not a device figure
(scripts/bench_serving.py isolates the device).

Usage (TPU): python scripts/bench_serve_load.py --batch 8 --clients 16
Prints one JSON line.
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/unipose_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--batch", type=int, default=8,
                   help="artifact's baked batch (micro-batch ceiling)")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--wait-ms", type=float, default=2.0)
    p.add_argument("--f32-input", action="store_true",
                   help="export an f32-input artifact (default: uint8 raw "
                        "pixels, normalize-on-device — 4x less transfer)")
    p.add_argument("--backend", default=None, choices=[None, "cpu"])
    args = p.parse_args()

    if args.backend == "cpu":
        from unipose_tpu.utils.platform import force_cpu_platform

        force_cpu_platform(1)

    import cv2
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import jax.numpy as jnp

    from bench import zeros_variables
    from unipose_tpu.cli import serve as serve_mod
    from unipose_tpu.compat.export import export_inference
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import build_model

    size = args.size
    config = ModelConfig(dataset="LSP", num_classes=14, compute_dtype=jnp.bfloat16)
    model = build_model(config)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = zeros_variables(model, x0)
    print(f"exporting batch-{args.batch} artifact...", flush=True)
    blob = export_inference(
        model, variables, (args.batch, size, size, 3),
        raw_uint8=not args.f32_input,
    )
    art_path = "/tmp/bench_serve_load.hlo"
    with open(art_path, "wb") as f:
        f.write(blob)

    ns = argparse.Namespace(
        artifact=art_path, num_joints=None, dataset="LSP", pretrained=None,
        size=size, batch_wait_ms=args.wait_ms, host="127.0.0.1", port=0,
    )
    server = serve_mod.make_server(ns)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (size, size, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    body = enc.tobytes()

    # warmup (first device call compiles/loads)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/predict", body)
    r = conn.getresponse()
    assert r.status == 200, r.read()
    r.read()
    print("warm; driving load...", flush=True)

    stop = time.monotonic() + args.seconds
    lat_lock = threading.Lock()
    lats, errs = [], [0]

    def client():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        my = []
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            try:
                c.request("POST", "/predict", body)
                resp = c.getresponse()
                resp.read()
                if resp.status != 200:
                    errs[0] += 1
                    continue
            except Exception:
                errs[0] += 1
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                continue
            my.append(time.perf_counter() - t0)
        with lat_lock:
            lats.extend(my)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    lats_ms = np.asarray(lats) * 1e3
    out = {
        "metric": "serve_load_req_per_s",
        "value": round(len(lats) / wall, 1),
        "unit": "req/s",
        "clients": args.clients,
        "batch": args.batch,
        "n": len(lats),
        "errors": errs[0],
        "p50_ms": round(float(np.percentile(lats_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lats_ms, 95)), 2),
        "p99_ms": round(float(np.percentile(lats_ms, 99)), 2),
    }
    print(json.dumps(out), flush=True)
    server.shutdown()


if __name__ == "__main__":
    main()
