"""Minimal inference server.

The reference has no serving stack (SURVEY.md: none); this is a small
TPU-backed endpoint over the same Predictor used by the CLIs — stdlib HTTP,
one process owns the chip, requests are served from the cached jitted steps.

Usage:
    python serve.py checkpoint=<ckpt> [port=8700] [mode=superpixel|pixel]
                    [scales=0.5] [warmup_hw=522,775]

API:
    GET  /healthz            -> {"status": "ok", "device": ...}
    POST /predict            -> binary PNG mask ({0,255})
         body: image file (PNG/JPEG/BMP); query args: ?scales=0.5,0.4
"""

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from wesup_tpu import cli


class _State:
    predictor = None
    scales = (0.5,)
    lock = threading.Lock()  # one chip, one forward at a time
    device = "?"


STATE = _State()


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):
        print("[serve]", fmt % args)

    def _json(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if urlparse(self.path).path == "/healthz":
            self._json(200, {"status": "ok", "device": STATE.device})
        else:
            self._json(404, {"error": "unknown path"})

    def do_POST(self):
        import cv2

        from wesup_tpu.inference import predict_multiscale

        parsed = urlparse(self.path)
        if parsed.path != "/predict":
            self._json(404, {"error": "unknown path"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if arr is None:
                self._json(400, {"error": "could not decode image"})
                return
            img = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)

            qs = parse_qs(parsed.query)
            scales = STATE.scales
            if "scales" in qs:
                scales = tuple(float(s) for s in qs["scales"][0].split(","))

            t0 = time.time()
            with STATE.lock:
                pred = predict_multiscale(STATE.predictor, img, scales=scales)
            dt = time.time() - t0

            ok, png = cv2.imencode(".png", (pred * 255).astype(np.uint8))
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("X-Inference-Seconds", f"{dt:.3f}")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png.tobytes())
        except Exception as exc:  # noqa: BLE001 - report to the client
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})


def create_server(checkpoint=None, port=8700, mode="superpixel",
                  scales=(0.5,), warmup_hw=None, host="0.0.0.0", **kwargs):
    """Build the model state and the HTTP server (without serving).

    Split from :func:`main` so tests can run the server on an ephemeral
    port in a thread and shut it down.
    """
    import jax

    from wesup_tpu.inference import Predictor
    from wesup_tpu.models import initialize_trainer

    if not isinstance(scales, (tuple, list)):
        scales = (scales,)

    trainer = initialize_trainer("wesup", **kwargs)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint)
    STATE.predictor = Predictor(trainer.params, trainer.config, mode=mode,
                              mesh=trainer.mesh)
    STATE.scales = tuple(scales)
    STATE.device = str(jax.devices()[0])

    if warmup_hw is not None:
        from wesup_tpu.inference import predict_multiscale

        h, w = int(warmup_hw[0]), int(warmup_hw[1])
        print(f"[serve] warming up ({h}x{w}, scales {scales}) ...")
        dummy = np.zeros((h, w, 3), np.uint8)
        predict_multiscale(STATE.predictor, dummy, scales=STATE.scales)
        print("[serve] warmup done")

    return ThreadingHTTPServer((host, int(port)), Handler)


def main(**kwargs):
    server = create_server(**kwargs)
    mode = kwargs.get("mode", "superpixel")
    print(f"[serve] listening on :{server.server_port} "
          f"(mode={mode}, device={STATE.device})")
    server.serve_forever()


if __name__ == "__main__":
    cli.run(main)
