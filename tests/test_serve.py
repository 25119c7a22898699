"""Serving example end-to-end: export a tiny model's artifact in-process,
serve it over HTTP (stdlib ThreadingHTTPServer), POST a JPEG, get keypoints.
"""

import http.client
import json
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unipose_tpu.cli import serve as serve_mod  # noqa: E402
from unipose_tpu.compat.export import export_inference  # noqa: E402
from unipose_tpu.core.config import ModelConfig  # noqa: E402
from unipose_tpu.models.unipose import build_model  # noqa: E402

SIZE = 64


@pytest.fixture(scope="module")
def artifact_path(tmp_path_factory):
    mc = ModelConfig(dataset="LSP", num_classes=14)
    model = build_model(mc)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3))
    )
    path = tmp_path_factory.mktemp("serve") / "model.hlo"
    export_inference(model, variables, (1, SIZE, SIZE, 3), path=str(path))
    return str(path)


def test_serve_predict(artifact_path):
    ns = type("A", (), {})()
    ns.artifact = artifact_path
    # geometry must be DERIVED from the artifact's avals — flags left at
    # defaults (and --size deliberately wrong) must not break /predict
    ns.num_joints = None
    ns.size = 368
    ns.host = "127.0.0.1"
    ns.port = 0  # ephemeral
    server = serve_mod.make_server(ns)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

        conn.request("GET", "/healthz")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["status"] == "ok"
        assert health["num_joints"] == 14
        assert health["input"] == [1, SIZE, SIZE, 3]  # from the artifact

        img = np.random.RandomState(0).randint(0, 255, (90, 120, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        conn.request(
            "POST", "/predict", body=buf.tobytes(),
            headers={"Content-Length": str(len(buf))},
        )
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        assert len(out["keypoints"]) == 14
        # keypoints map back to ORIGINAL image pixel space
        for x, y in out["keypoints"]:
            assert 0 <= x <= 120 and 0 <= y <= 90

        # malformed body -> 400, server stays alive
        conn.request(
            "POST", "/predict", body=b"not an image",
            headers={"Content-Length": "12"},
        )
        r = conn.getresponse()
        assert r.status == 400
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()
