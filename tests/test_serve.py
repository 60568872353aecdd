"""Serving endpoint test: in-process HTTP server on the CPU mesh."""

import sys
import threading
import urllib.error
import urllib.request
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.fixture(scope="module")
def server():
    import serve

    srv = serve.create_server(port=0, host="127.0.0.1", scales=(0.5,),
                              canvas_size=(48, 64), slic_iters=2,
                              sp_area=100, compute_dtype="float32")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as resp:
        return resp.status, resp.read(), dict(resp.headers)


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), dict(resp.headers)


def test_healthz(server):
    status, body, _ = _get(server + "/healthz")
    assert status == 200
    assert b'"status": "ok"' in body


def test_predict_returns_binary_png_mask(server):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    assert ok
    status, body, headers = _post(server + "/predict", png.tobytes())
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert float(headers["X-Inference-Seconds"]) > 0
    mask = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (40, 56)
    assert set(np.unique(mask)) <= {0, 255}


def test_predict_rejects_garbage(server):
    try:
        status, _, _ = _post(server + "/predict", b"not an image")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_unknown_path_404(server):
    try:
        status, _, _ = _get(server + "/nope")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
