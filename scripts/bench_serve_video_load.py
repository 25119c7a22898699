"""Video/streaming serving under concurrent load (VERDICT r4 weak #4).

Round 4 measured the image server under 16 concurrent clients (50.7 req/s
with uint8 artifacts); this script does the same for the VIDEO surfaces:

  --mode clips   concurrent T-frame clips against a batched video artifact
                 -> the clip MicroBatcher coalesces them into the baked
                 batch dim (cli/serve.py _call_clips route);
  --mode stream  concurrent long clips against a --stream artifact -> each
                 request carries its own ConvLSTM state across chunk calls,
                 NO coalescing (cli/serve.py predict_video stream route) —
                 this measures the per-client-state concurrency ceiling.

End-to-end path per request: HTTP -> base64 JPEG decode x T -> resize ->
(micro-batch | chunk loop) -> device -> argmax -> JSON.  1-vCPU host: the
numbers are whole-system figures (frame decode for T frames per request
contends with dispatch), not device figures.

Usage (TPU):
    python scripts/bench_serve_video_load.py --mode clips --batch 4 --clients 8
    python scripts/bench_serve_video_load.py --mode stream --frames 20 --clients 4
Prints one JSON line.
"""

import argparse
import base64
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
    p.add_argument("--mode", choices=["clips", "stream"], default="clips")
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--clip-t", type=int, default=5,
                   help="artifact clip length T (frames per device call)")
    p.add_argument("--batch", type=int, default=4,
                   help="clips mode: artifact's baked clip-batch dim")
    p.add_argument("--frames", type=int, default=20,
                   help="stream mode: frames per client request (chunked "
                        "into clip-t device calls with carried state)")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--wait-ms", type=float, default=4.0)
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
    from unipose_tpu.compat.export import export_inference, export_video_stream
    from unipose_tpu.core.config import ModelConfig
    from unipose_tpu.models.unipose import build_model

    size, T = args.size, args.clip_t
    config = ModelConfig(
        dataset="Penn_Action", num_classes=13, variant="lstm",
        frame_memory=T, compute_dtype=jnp.bfloat16,
    )
    model = build_model(config)
    variables = zeros_variables(
        model,
        jnp.zeros((1, T, size, size, 3), jnp.float32),
        jnp.zeros((1, T, size, size, 1), jnp.float32),
    )
    if args.mode == "clips":
        print(f"exporting clip-batch-{args.batch} T={T} artifact...", flush=True)
        blob = export_inference(
            model, variables, (args.batch, T, size, size, 3),
            video=True, raw_uint8=True,
        )
        frames_per_req = T
    else:
        print(f"exporting streaming T={T} artifact...", flush=True)
        blob = export_video_stream(
            model, variables, (1, T, size, size, 3), raw_uint8=True,
        )
        frames_per_req = args.frames
    art_path = "/tmp/bench_serve_video_load.hlo"
    with open(art_path, "wb") as f:
        f.write(blob)

    ns = argparse.Namespace(
        artifact=art_path, num_joints=None, dataset="Penn_Action",
        pretrained=None, size=size, batch_wait_ms=args.wait_ms,
        host="127.0.0.1", port=0,
    )
    server = serve_mod.make_server(ns)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    frames = []
    for i in range(frames_per_req):
        ok, enc = cv2.imencode(
            ".jpg", rng.randint(0, 255, (size, size, 3), np.uint8)
        )
        assert ok
        frames.append(base64.b64encode(enc.tobytes()).decode())
    body = json.dumps({"frames": frames}).encode()

    # warmup (compiles/loads the artifact call(s))
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/predict_video", body,
                 headers={"Content-Length": str(len(body))})
    r = conn.getresponse()
    assert r.status == 200, r.read()
    r.read()
    print("warm; driving load...", flush=True)

    stop = time.monotonic() + args.seconds
    lat_lock = threading.Lock()
    lats, errs = [], [0]

    def client():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        my = []
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            try:
                c.request("POST", "/predict_video", body,
                          headers={"Content-Length": str(len(body))})
                resp = c.getresponse()
                resp.read()
                if resp.status != 200:
                    errs[0] += 1
                    continue
            except Exception:
                errs[0] += 1
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
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
        "metric": f"serve_video_load_{args.mode}",
        "value": round(len(lats) / wall, 2),
        "unit": "req/s",
        "frames_per_s": round(len(lats) * frames_per_req / wall, 1),
        "clients": args.clients,
        "clip_t": T,
        "frames_per_req": frames_per_req,
        "batch": args.batch if args.mode == "clips" else 1,
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
