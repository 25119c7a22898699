"""Pose-estimation server over exported StableHLO artifacts.

The reference has no serving story at all (SURVEY §1); its closest analogue
is the per-image demo loop (Reference: unipose.py:197-246).  This is the
deployment-shaped version: a self-contained artifact (weights baked in,
``compat/export.py``) served over HTTP with the stdlib only — no framework
dependencies, so it runs anywhere a JAX runtime does.

Both model families are servable:
  * image artifacts ((B, H, W, 3) input): ``/predict``, with request
    micro-batching — concurrent requests are grouped into one artifact call
    up to the artifact's baked batch size (export with ``--batch N``);
  * video artifacts ((B, T, H, W, 3) + centermap inputs): ``/predict_video``
    takes a JSON clip of base64 JPEG frames, short clips are padded by
    repeating the last frame;
  * STREAMING video artifacts (``cli/export --stream``): ``/predict_video``
    accepts clips of ANY length — the artifact is a chunk-program pair and
    the server carries the ConvLSTM state across fixed-T chunk calls
    (the artifact twin of eval/video.py::stream_video).

Endpoints:
  GET  /healthz        -> {"status": "ok", "kind": "image"|"video", ...}
  POST /predict        body = JPEG/PNG bytes
                       -> {"keypoints": [[x, y], ...K], "ms": float}
  POST /predict_video  body = {"frames": ["<b64 jpeg>", ...]}
                       -> {"keypoints": [[[x, y], ...K], ...T'], "ms": float}
     keypoints are argmax coords in input-image pixels (the demo path's
     get_kpts semantics: heatmap argmax scaled back to image resolution).

Usage:
  python -m unipose_tpu.cli.serve --artifact model.hlo [--port 8500]
  python -m unipose_tpu.cli.serve --dataset LSP [--pretrained w.pth.tar]
      (no artifact: builds the model, exports in-process, then serves)
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time

import numpy as np


class MicroBatcher:
    """Group concurrent single-image requests into one artifact call.

    The artifact's batch dimension is static; a dispatcher thread drains up
    to ``batch`` queued requests per call (waiting ``wait_ms`` for
    stragglers once at least one request is pending), pads the tail slot-
    repeating, and fans results back out.  With batch 1 it degenerates to a
    FIFO that serializes device access — still correct, no waiting.
    """

    def __init__(self, call, batch: int, wait_ms: float = 2.0):
        self.call = call
        self.batch = int(batch)
        self.wait = (wait_ms / 1e3) if self.batch > 1 else 0.0
        self._cv = threading.Condition()
        self._queue = []
        threading.Thread(target=self._run, daemon=True).start()

    def infer(self, x: np.ndarray) -> np.ndarray:
        """x: one (H, W, 3) preprocessed image -> its (h, w, K+1) heatmaps."""
        item = {"x": x, "done": threading.Event(), "out": None, "err": None}
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item["done"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def _run(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                if self.wait:  # let concurrent requests join until deadline
                    deadline = time.monotonic() + self.wait
                    while len(self._queue) < self.batch:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(remaining)
                items = self._queue[: self.batch]
                del self._queue[: self.batch]
            xs = np.stack([it["x"] for it in items])
            if len(items) < self.batch:  # pad the static batch dim
                pad = np.repeat(xs[-1:], self.batch - len(items), axis=0)
                xs = np.concatenate([xs, pad])
            try:
                heat = np.asarray(self.call(xs))
                for i, it in enumerate(items):
                    it["out"] = heat[i]
            except Exception as e:  # noqa: BLE001 — fan the error out
                for it in items:
                    it["err"] = e
            for it in items:
                it["done"].set()


def _argmax_kpts(heat: np.ndarray, num_joints: int, w0: int, h0: int):
    """Per-channel argmax (channel 0 = background) scaled to original
    pixels — the demo path's get_kpts semantics (utils/utils.py:94-106)."""
    hh, ww = heat.shape[:2]
    kpts = []
    for k in range(1, num_joints + 1):
        idx = int(np.argmax(heat[..., k]))
        y, x = divmod(idx, ww)
        kpts.append([round(x * w0 / ww, 2), round(y * h0 / hh, 2)])
    return kpts


def _centermaps(b: int, t: int, size: int) -> np.ndarray:
    """(B, T, H, W, 1) sigma-3 Gaussian at the frame center — the video
    pipeline's centermap (train/steps.py::make_centermaps semantics with
    center = image center)."""
    ys, xs = np.mgrid[:size, :size].astype(np.float32)
    c = (size - 1) / 2.0
    g = np.exp(-((xs - c) ** 2 + (ys - c) ** 2) / (2.0 * 3.0**2))
    return np.broadcast_to(g[None, None, :, :, None], (b, t, size, size, 1)).copy()


def build_handler(predict_routes: dict, meta: dict):
    """HTTP handler factory; ``predict_routes`` maps path -> fn(body)->dict."""
    import http.server

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
            fn = predict_routes.get(self.path)
            if fn is None:
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                self._send(200, fn(self.rfile.read(n)))
            except Exception as e:  # noqa: BLE001 — surface as 400
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def _decode_image(buf: bytes):
    import cv2

    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("body is not a decodable image")
    return img


def _native_mem_decode() -> bool:
    """True when the C++ decode core is loadable (graceful fallback to the
    cv2 path otherwise — same contract as the dataset loaders)."""
    try:
        from unipose_tpu import native

        return native.available()
    except Exception:
        return False


def make_server(args):
    """Build the HTTPServer (separated from main for tests)."""
    import http.server

    import cv2
    import jax.numpy as jnp

    from unipose_tpu.compat.export import (
        is_stream_artifact,
        load_exported,
        load_video_stream,
    )
    from unipose_tpu.train.steps import preprocess_images

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
            raw_uint8=True,  # normalize on device: 4x less per-request transfer
        )

    stream = is_stream_artifact(blob)
    if stream:
        init_exp, cont_exp = load_video_stream(blob)
        exported = init_exp
        init_call, cont_call = init_exp.call, cont_exp.call
        call = None
    else:
        exported = load_exported(blob)
        call = exported.call
    in_avals = exported.in_avals
    video = stream or (len(in_avals) == 2 and in_avals[0].ndim == 5)
    if not video and (len(in_avals) != 1 or in_avals[0].ndim != 4):
        raise SystemExit(
            "serve expects an image artifact with one (B, H, W, 3) input or "
            "a video artifact with (B, T, H, W, 3) + centermap inputs; got "
            f"{len(in_avals)} input(s) {[tuple(a.shape) for a in in_avals]}"
        )
    # The artifact is the source of truth for geometry: flags can't lie
    # about an artifact's shapes — a mismatched --size would turn every
    # /predict into an opaque 400.  Its input dtype likewise decides the
    # wire format: uint8 artifacts (export --raw_uint8) normalize on device
    # and the server ships raw pixels (4x less host->device transfer).
    raw_u8 = in_avals[0].dtype == jnp.uint8
    in_shape = tuple(in_avals[0].shape)
    baked_batch = int(in_shape[0])
    size = int(in_shape[2] if video else in_shape[1])
    derived_joints = int(exported.out_avals[0].shape[-1]) - 1
    if num_joints is None:
        num_joints = derived_joints
    elif num_joints > derived_joints:
        raise SystemExit(
            f"--num_joints {num_joints} exceeds the artifact's "
            f"{derived_joints} joint channels — every /predict would fail; "
            "drop the flag to derive the count from the artifact"
        )

    routes = {}
    if video:
        clip_t = int(in_shape[1])

        def _decode_clip(body: bytes):
            req = json.loads(body)
            frames_b64 = req.get("frames")
            if not isinstance(frames_b64, list) or not frames_b64:
                raise ValueError('body must be {"frames": ["<b64 jpeg>", ...]}')
            bufs = [base64.b64decode(fb) for fb in frames_b64]
            dt = np.uint8 if raw_u8 else np.float32
            if _native_mem_decode():
                # C++ thread-pool batch decode (bit-identical to the cv2
                # path below, tests/test_native.py) — the video server is
                # host-decode-bound (BENCHMARKS round-5 load study), and T
                # frames per request is exactly the batch shape the core
                # fans out.
                from unipose_tpu import native

                out, statuses, nd = native.decode_batch_mem(
                    bufs, size, return_dims=True
                )
                bad = np.nonzero(statuses)[0]
                if bad.size:
                    raise ValueError(f"frame {int(bad[0])} is not a decodable image")
                dims = [(int(c), int(r)) for r, c in nd]  # (w0, h0)
                return out.astype(dt), dims
            imgs = [_decode_image(b) for b in bufs]
            dims = [(im.shape[1], im.shape[0]) for im in imgs]  # (w0, h0)
            frames = np.stack(
                [cv2.resize(im, (size, size)).astype(dt) for im in imgs]
            )
            return frames, dims

        def _pad_clip(frames, t_target):
            """Pad the time dim to ``t_target`` (repeat last frame), add the
            batch dim, pad the static batch dim."""
            if frames.shape[0] < t_target:
                pad = np.repeat(frames[-1:], t_target - frames.shape[0], axis=0)
                frames = np.concatenate([frames, pad])
            clip = (
                frames[None]
                if raw_u8
                else np.asarray(preprocess_images(frames))[None]
            )
            if baked_batch > 1:
                clip = np.concatenate(
                    [clip, np.repeat(clip[-1:], baked_batch - 1, axis=0)]
                )
            return clip

        if stream:

            def predict_video(body: bytes):
                """Any clip length: run in clip_t chunks, ConvLSTM state
                carried across chunk calls (the artifact twin of
                eval/video.py::stream_video)."""
                frames, dims = _decode_clip(body)
                t_real = len(dims)
                cm = _centermaps(baked_batch, clip_t, size)
                t0 = time.perf_counter()
                heats, state = [], None
                for start in range(0, t_real, clip_t):
                    clip = _pad_clip(frames[start : start + clip_t], clip_t)
                    if state is None:
                        heat, cell, hide = init_call(clip, cm)
                    else:
                        heat, cell, hide = cont_call(clip, cm, *state)
                    state = (cell, hide)
                    heats.append(np.asarray(heat[0]))
                dt = (time.perf_counter() - t0) * 1e3
                heat_all = np.concatenate(heats, axis=0)[:t_real]
                kpts = [
                    _argmax_kpts(heat_all[j], num_joints, *dims[j])
                    for j in range(t_real)
                ]
                return {"keypoints": kpts, "ms": round(dt, 2)}

        else:
            # Concurrent CLIPS micro-batch into the artifact's baked batch
            # dim, exactly like concurrent images on the image path (each
            # MicroBatcher slot is one (T, H, W, 3) clip; the centermap is
            # server-generated and identical per clip).  Streaming artifacts
            # can't coalesce — each client's ConvLSTM state is its own.
            cm_batch = _centermaps(baked_batch, clip_t, size)

            def _call_clips(clips):
                return call(clips, cm_batch)

            video_batcher = MicroBatcher(
                _call_clips, baked_batch, wait_ms=args.batch_wait_ms
            )

            def predict_video(body: bytes):
                frames, dims = _decode_clip(body)
                t_real = len(dims)
                if t_real > clip_t:
                    raise ValueError(
                        f"clip too long: {t_real} frames > artifact "
                        f"clip length {clip_t} (export a streaming artifact "
                        "with cli/export --stream to serve long videos)"
                    )
                if frames.shape[0] < clip_t:  # repeat-last-frame pad
                    pad = np.repeat(
                        frames[-1:], clip_t - frames.shape[0], axis=0
                    )
                    frames = np.concatenate([frames, pad])
                clip = (
                    frames
                    if raw_u8
                    else np.asarray(preprocess_images(frames))
                )
                t0 = time.perf_counter()
                heat = video_batcher.infer(clip)  # (T, h, w, K+1)
                dt = (time.perf_counter() - t0) * 1e3
                kpts = [
                    _argmax_kpts(heat[j], num_joints, *dims[j])
                    for j in range(t_real)
                ]
                return {"keypoints": kpts, "ms": round(dt, 2)}

        routes["/predict_video"] = predict_video
    else:
        batcher = MicroBatcher(call, baked_batch, wait_ms=args.batch_wait_ms)

        def predict(body: bytes):
            img = _decode_image(body)
            h0, w0 = img.shape[:2]
            img368 = cv2.resize(img, (size, size))
            x = (
                img368.astype(np.uint8)
                if raw_u8
                else np.asarray(preprocess_images(img368.astype(np.float32)))
            )
            t0 = time.perf_counter()
            heat = batcher.infer(x)
            dt = (time.perf_counter() - t0) * 1e3
            return {
                "keypoints": _argmax_kpts(heat, num_joints, w0, h0),
                "ms": round(dt, 2),
            }

        routes["/predict"] = predict

    meta = {
        "kind": ("video_stream" if stream else "video") if video else "image",
        "input": list(in_shape),
        "input_dtype": "uint8" if raw_u8 else "float32",
        "num_joints": num_joints,
        "batch": baked_batch,
        "artifact_bytes": len(blob),
    }
    handler = build_handler(routes, meta)
    return http.server.ThreadingHTTPServer((args.host, args.port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description="unipose_tpu serving example")
    p.add_argument(
        "--artifact",
        default=None,
        help="exported StableHLO path (input size / clip length / joint "
        "count / batch are read from the artifact itself)",
    )
    p.add_argument("--num_joints", type=int, default=None)
    p.add_argument("--dataset", default="LSP")
    p.add_argument("--pretrained", default=None)
    p.add_argument(
        "--size", type=int, default=368, help="input size for in-process export"
    )
    p.add_argument(
        "--batch_wait_ms", type=float, default=2.0,
        help="micro-batching: wait this long for concurrent requests to "
        "fill the artifact's baked batch",
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    args = p.parse_args(argv)

    server = make_server(args)
    print(f"serving on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
