"""Minimal pose-estimation server over an exported StableHLO artifact.

The reference has no serving story at all (SURVEY §1); its closest analogue
is the per-image demo loop (Reference: unipose.py:197-246).  This is the
deployment-shaped version: a self-contained artifact (weights baked in,
``compat/export.py``) served over HTTP with the stdlib only — no framework
dependencies, so it runs anywhere a JAX runtime does.

Endpoints:
  GET  /healthz           -> {"status": "ok", "input": [...], ...}
  POST /predict           body = JPEG/PNG bytes
                          -> {"keypoints": [[x, y], ...K], "ms": float}
     keypoints are argmax coords in input-image pixels (the demo path's
     get_kpts semantics: heatmap argmax scaled back to image resolution).

Usage:
  python -m unipose_tpu.cli.serve --artifact model.hlo [--port 8500]
  python -m unipose_tpu.cli.serve --dataset LSP [--pretrained w.pth.tar]
      (no artifact: builds the model, exports in-process, then serves)
"""

from __future__ import annotations

import argparse
import json
import time


def build_handler(call, size: int, num_joints: int, meta: dict):
    """HTTP handler factory around the loaded artifact ``call``."""
    import http.server

    import cv2
    import numpy as np

    from unipose_tpu.train.steps import preprocess_images

    def predict(body: bytes):
        img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("request body is not a decodable image")
        h0, w0 = img.shape[:2]
        img368 = cv2.resize(img, (size, size)).astype(np.float32)
        t0 = time.perf_counter()
        heat = np.asarray(call(preprocess_images(img368[None])))[0]
        dt = (time.perf_counter() - t0) * 1e3
        # channel-last heatmaps; channel 0 is background -> joints 1..K
        hh, ww = heat.shape[:2]
        kpts = []
        for k in range(1, num_joints + 1):
            idx = int(np.argmax(heat[..., k]))
            y, x = divmod(idx, ww)
            kpts.append(
                [round(x * w0 / ww, 2), round(y * h0 / hh, 2)]
            )
        return {"keypoints": kpts, "ms": round(dt, 2)}

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", **meta})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                result = predict(self.rfile.read(n))
                self._send(200, result)
            except Exception as e:  # noqa: BLE001 — surface as 400
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def make_server(args):
    """Build the HTTPServer (separated from main for tests)."""
    import http.server

    import jax.numpy as jnp

    from unipose_tpu.compat.export import load_exported

    size = args.size
    if args.artifact:
        with open(args.artifact, "rb") as f:
            blob = f.read()
        num_joints = args.num_joints  # optional override; derived below if None
    else:
        import jax

        from unipose_tpu.compat.export import export_inference
        from unipose_tpu.core.config import DATASETS, ModelConfig, TrainConfig
        from unipose_tpu.train.checkpoint import warm_start_from_torch
        from unipose_tpu.train.state import create_train_state

        spec = DATASETS[args.dataset]
        num_joints = spec.num_joints
        mc = ModelConfig(
            dataset=args.dataset,
            num_classes=num_joints,
            compute_dtype=jnp.bfloat16,
        )
        model, _, state = create_train_state(
            mc, TrainConfig(), jax.random.PRNGKey(0), input_size=size
        )
        if args.pretrained:
            state = warm_start_from_torch(state, args.pretrained)
        blob = export_inference(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            (1, size, size, 3),
        )

    exported = load_exported(blob)
    call = exported.call
    if len(exported.in_avals) != 1 or exported.in_avals[0].ndim != 4:
        raise SystemExit(
            "serve expects an image artifact with one (B, H, W, 3) input; "
            f"got {len(exported.in_avals)} input(s) "
            f"{[tuple(a.shape) for a in exported.in_avals]} — video artifacts "
            "are not servable by this endpoint"
        )
    # The artifact is the source of truth for geometry: (1, H, W, 3) input,
    # (1, h, w, K+1) heatmaps (channel 0 is background).  Flags can't lie
    # about an artifact's shapes — a mismatched --size would turn every
    # /predict into an opaque 400.
    in_shape = tuple(exported.in_avals[0].shape)  # (B, H, W, 3), guarded above
    size = int(in_shape[1])
    derived_joints = int(exported.out_avals[0].shape[-1]) - 1
    if num_joints is None:
        num_joints = derived_joints
    elif num_joints > derived_joints:
        raise SystemExit(
            f"--num_joints {num_joints} exceeds the artifact's "
            f"{derived_joints} joint channels — every /predict would fail; "
            "drop the flag to derive the count from the artifact"
        )
    meta = {
        "input": list(in_shape),
        "num_joints": num_joints,
        "artifact_bytes": len(blob),
    }
    handler = build_handler(call, size, num_joints, meta)
    return http.server.ThreadingHTTPServer((args.host, args.port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description="unipose_tpu serving example")
    p.add_argument(
        "--artifact",
        default=None,
        help="exported StableHLO path (input size / joint count are read "
        "from the artifact itself)",
    )
    p.add_argument("--num_joints", type=int, default=None)
    p.add_argument("--dataset", default="LSP")
    p.add_argument("--pretrained", default=None)
    p.add_argument(
        "--size", type=int, default=368, help="input size for in-process export"
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    args = p.parse_args(argv)

    server = make_server(args)
    print(f"serving on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
