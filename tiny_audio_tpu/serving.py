"""HTTP serving: a dependency-free transcription server over the pipeline.

The reference serves via HF Inference Endpoints (handler.py) and Spaces; a
TPU deployment needs an in-process server.  Stdlib ``ThreadingHTTPServer``
accepts concurrent uploads; TPU work is serialized through a lock (one chip,
one graph) while mel extraction and wav decoding run on request threads.

Routes:
    POST /transcribe        body: wav bytes (or raw f32 PCM with
                            ``Content-Type: application/pcm-f32``)
                            query params: timestamps=1, speakers=1, prompt=...
    GET  /healthz           liveness + model info
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


def make_server(
    handler, host: str = "0.0.0.0", port: int = 8000
) -> ThreadingHTTPServer:
    """``handler``: an :class:`~tiny_audio_tpu.handler.EndpointHandler`."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: dict) -> None:
            payload = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._send(200, {"status": "ok", "framework": "tiny_audio_tpu"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/transcribe":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype == "application/pcm-f32":
                inputs = np.frombuffer(raw, np.float32).copy()
            else:
                inputs = raw  # wav bytes
            q = parse_qs(url.query)
            params = {}
            if q.get("timestamps", ["0"])[0] == "1":
                params["return_timestamps"] = True
            if q.get("speakers", ["0"])[0] == "1":
                params["return_speakers"] = True
            if "prompt" in q:
                params["user_prompt"] = q["prompt"][0]
            with lock:  # serialize TPU work
                result = handler({"inputs": inputs, "parameters": params})
            self._send(200 if "error" not in result else 500, result)

    return ThreadingHTTPServer((host, port), Handler)


def serve(model_path: str, host: str = "0.0.0.0", port: int = 8000,
          warmup: bool = True) -> None:
    from tiny_audio_tpu.handler import EndpointHandler

    handler = EndpointHandler(model_path)
    if warmup:
        print("[serve] warming up (compiling)...")
        handler.warmup()
    server = make_server(handler, host, port)
    print(f"[serve] listening on {host}:{port}")
    server.serve_forever()
