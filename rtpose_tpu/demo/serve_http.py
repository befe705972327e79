"""Minimal HTTP pose-estimation service.

POST an image (jpeg/png bytes) to /pose and get keypoints JSON back:

    python -m rtpose_tpu.demo.serve_http --port 8080 --weight ckpt.pth
    curl --data-binary @ski.jpg localhost:8080/pose

Response: {"people": [{"score": s, "parts": {"nose": [x, y, score], ...}}],
"size": [h, w]} with pixel coordinates in the original image frame.
A production deployment would put batching in front (see
infer.pipeline.PosePipeline.run_batch); this endpoint serves one request
per call and exists so every reference demo surface has an analogue plus a
network-serving path the reference lacks.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..skeleton import PART_NAMES


def make_handler(pipeline, lock):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": "POST an image to /pose"})

        def do_POST(self):
            if self.path != "/pose":
                self._reply(404, {"error": "unknown endpoint"})
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._reply(400, {"error": "could not decode image"})
                return
            with lock:  # single pipeline; jit dispatch is not reentrant-safe
                people, _h, _p, meta = pipeline.run(img)
                pix = pipeline.keypoints_pixels(people, meta)
            out = [{
                "score": person["score"],
                "parts": {PART_NAMES[part]: [x, y, s]
                          for part, (x, y, s) in person["parts"].items()},
            } for person in pix]
            self._reply(200, {"people": out,
                              "size": [img.shape[0], img.shape[1]]})

    return Handler


def serve(pipeline, host: str = "0.0.0.0", port: int = 8080):
    lock = threading.Lock()
    server = ThreadingHTTPServer((host, port),
                                 make_handler(pipeline, lock))
    print(f"serving pose estimation on {host}:{port} (POST /pose)")
    return server


def main():
    from .picture_demo import add_common_args, build_pipeline

    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()
    pipeline = build_pipeline(args)
    serve(pipeline, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
