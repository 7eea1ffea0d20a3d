"""Minimal stdlib HTTP serving endpoint for exported screening models.

Endpoints:

    GET  /healthz        → {"status": "ok", "model": <arch>}
    GET  /manifest       → the artifact manifest JSON
    POST /predict        → body: raw image bytes (JPEG/PNG/BMP);
                           response: {prob_positive, flagged, threshold,
                           positive_class}
    POST /predict_paths  → body: {"paths": [server-local image paths]};
                           response: triage-schema rows (the CSV columns of
                           reference semi_supervised.py:472-511 as JSON)

One compiled program serves every request (the exported artifact's symbolic
batch); a lock serializes device dispatch so concurrent requests queue
rather than interleave compiles. This is a single-model scoring sidecar,
not a gateway — TLS, auth, and multi-model routing belong in front of it.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


def _decode_image_bytes(body: bytes) -> np.ndarray:
    import io

    from PIL import Image

    with Image.open(io.BytesIO(body)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def make_server(model, host: str = "127.0.0.1", port: int = 0):
    """Build a ThreadingHTTPServer around any predictor with the
    ``predict_images(images_u8, paths=...)`` / ``image_size`` /
    ``manifest``-ish surface (``ExportedModel`` or ``ScreeningPredictor``).
    """
    lock = threading.Lock()
    manifest = getattr(model, "manifest", None) or {
        "arch": getattr(model, "arch", "unknown"),
        "image_size": model.image_size,
        "threshold": model.threshold,
        "positive_class": model.positive_class,
    }

    def predict_array(arr: np.ndarray):
        from ssip_tpu.train.data import _resize_on_device

        s = model.image_size
        if arr.shape != (s, s, 3):
            arr = np.asarray(_resize_on_device([arr], s))[0]
        with lock:
            return model.predict_images(arr[None])

    def predict_paths(paths):
        from ssip_tpu.data.decode import decode_batch
        from ssip_tpu.train.data import _resize_on_device

        arrays, failures = decode_batch(
            [Path(p) for p in paths], convert_rgb=True, num_threads=4
        )
        kept = [(p, a) for p, a in zip(paths, arrays) if a is not None]
        if not kept:
            return None, [str(p) for p in failures]
        resized = np.asarray(
            _resize_on_device([a for _, a in kept], model.image_size)
        )
        with lock:
            result = model.predict_images(resized, paths=[p for p, _ in kept])
        return result, [str(p) for p in failures]

    class Handler(BaseHTTPRequestHandler):
        def _send_json(self, obj, status: int = 200) -> None:
            payload = json.dumps(obj).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # route through our logger
            LOGGER.debug("http: " + fmt, *args)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._send_json(
                    {"status": "ok", "model": manifest.get("arch", "unknown")}
                )
            elif self.path == "/manifest":
                self._send_json(manifest)
            else:
                self._send_json({"error": f"unknown path {self.path}"}, 404)

        def do_POST(self):  # noqa: N802 (stdlib API)
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                if self.path == "/predict":
                    arr = _decode_image_bytes(body)
                    result = predict_array(arr)
                    self._send_json(
                        {
                            "prob_positive": float(result.prob_positive[0]),
                            "flagged": bool(result.flagged[0]),
                            "threshold": result.threshold,
                            "positive_class": result.positive_class,
                        }
                    )
                elif self.path == "/predict_paths":
                    req = json.loads(body.decode("utf-8"))
                    paths = req.get("paths") or []
                    if not paths:
                        self._send_json({"error": "no paths given"}, 400)
                        return
                    result, failures = predict_paths(paths)
                    if result is None:
                        self._send_json(
                            {"error": "no decodable images",
                             "failures": failures}, 400,
                        )
                        return
                    self._send_json(
                        {
                            "rows": [
                                {
                                    "path": p,
                                    "prob_positive": float(prob),
                                    "flagged": bool(flag),
                                }
                                for p, prob, flag in zip(
                                    result.paths,
                                    result.prob_positive,
                                    result.flagged,
                                )
                            ],
                            "threshold": result.threshold,
                            "positive_class": result.positive_class,
                            "failures": failures,
                        }
                    )
                else:
                    self._send_json({"error": f"unknown path {self.path}"}, 404)
            except Exception as exc:  # a bad request must not kill the server
                LOGGER.warning("request failed: %s", exc)
                self._send_json({"error": str(exc)}, 400)

    return ThreadingHTTPServer((host, port), Handler)
