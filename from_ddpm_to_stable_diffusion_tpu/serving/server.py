"""Stdlib HTTP front-end over the DynamicBatcher.

Endpoints (the server side of the capability the reference consumes as a
client in 09_api/01_replicate.py:1-28):

  POST /v1/generate   {"prompt": str, "negative_prompt"?: str, "seed"?: int,
                       "format"?: "png" | "json"}
                      → image/png bytes (default), or JSON
                        {"shape": [...], "image_b64": "<base64 raw RGB>"}
  GET  /healthz       → {"ok": true, ...batcher counters}
  GET  /metrics       → batcher counters + latency percentiles + batch stats

Uses ThreadingHTTPServer: each connection blocks on its request's Future
while the single batcher worker drives the TPU — concurrency lives in the
queue, not in competing device streams.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .batcher import DynamicBatcher, GenerateRequest


def _png_bytes(image: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(image, np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def make_server(batcher: DynamicBatcher, host: str = "127.0.0.1",
                port: int = 8000,
                request_timeout_s: float = 600.0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. ``port=0`` binds an ephemeral port
    (tests); read it back from ``server.server_address[1]``."""

    class Handler(BaseHTTPRequestHandler):
        # quieter than the default stderr-per-request logger
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send_json(self, obj, status=200):
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._send_json({"ok": True, **batcher.metrics()})
            elif self.path == "/metrics":
                self._send_json(batcher.metrics())
            else:
                self._send_json({"error": "not found"}, status=404)

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/generate":
                self._send_json({"error": "not found"}, status=404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("body must be a JSON object")
                prompt = payload["prompt"]
            except (KeyError, ValueError, json.JSONDecodeError):
                self._send_json(
                    {"error": "body must be JSON with a 'prompt' field"},
                    status=400)
                return
            seed = payload.get("seed")
            if seed is not None and not isinstance(seed, int):
                self._send_json({"error": "'seed' must be an integer"},
                                status=400)
                return
            req = GenerateRequest(prompt=str(prompt),
                                  negative_prompt=str(
                                      payload.get("negative_prompt", "")),
                                  seed=seed)
            try:
                image = batcher.submit(req).result(timeout=request_timeout_s)
            except TimeoutError:
                self._send_json({"error": "generation timed out"}, status=504)
                return
            except Exception as e:  # noqa: BLE001 — surface as 500, keep serving
                self._send_json({"error": str(e)}, status=500)
                return
            if payload.get("format", "png") == "json":
                self._send_json({
                    "shape": list(image.shape),
                    "dtype": "uint8",
                    "image_b64": base64.b64encode(
                        np.ascontiguousarray(image, np.uint8).tobytes()
                    ).decode(),
                })
            else:
                body = _png_bytes(image)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="fdsd-http")
    t.start()
    return t
