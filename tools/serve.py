"""Minimal HTTP serving front-end for an exported OTPose artifact.

    python tools/serve.py --artifact OUTPUT_DIR/export [--port 8500]

Loads a ``jax.export`` artifact produced by ``export.py`` (weights baked
in — no checkpoint or otpose_tpu model code needed at serving time) and
serves:

- ``GET /health`` -> the artifact manifest (json)
- ``POST /predict`` with an ``.npz`` body containing ``inputs``
  (B, H, W, 15) float32 and ``margin`` (B, 4) float32 -> json
  ``{"coords": ..., "maxvals": ..., "raw_coords": ...}`` (decoded
  artifacts) or ``{"heatmaps": ..., "teacher": ...}``.

Requests smaller than the exported batch are zero-padded to it and the
response sliced back; larger requests are rejected (export one artifact
per serving batch size — the executable is shape-specialized by design).

Stdlib http.server only — this is the reference serving shim for tests
and small deployments, not a production load balancer.  (No reference
counterpart; the reference's intended single-clip API is covered by
``otpose_tpu/cli/inference.py``.)
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _predict(model, arrays):
    """Run one request dict through the loaded artifact, handling padding."""
    inputs = np.asarray(arrays["inputs"], np.float32)
    margin = np.asarray(arrays["margin"], np.float32)
    bs = model.meta["batch_size"]
    n = inputs.shape[0]
    if n > bs:
        raise ValueError(f"request batch {n} > exported batch {bs}")
    if margin.shape[0] != n:
        raise ValueError("inputs/margin batch mismatch")
    if n < bs:
        pad = bs - n
        inputs = np.concatenate(
            [inputs, np.zeros((pad,) + inputs.shape[1:], np.float32)])
        margin = np.concatenate([margin, np.ones((pad, 4), np.float32)])
    outs = [np.asarray(o)[:n] for o in model(inputs, margin)]
    if model.meta.get("decoded", True):
        names = ("coords", "maxvals", "raw_coords")
    else:
        names = ("heatmaps", "teacher")
    return {k: v.tolist() for k, v in zip(names, outs)}


def make_server(artifact_dir: str, host: str = "127.0.0.1",
                port: int = 8500) -> ThreadingHTTPServer:
    """Build (but don't start) the server; tests drive it on port 0."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from otpose_tpu.engine.export import load_exported

    model = load_exported(artifact_dir)
    # warm the executable so the first request doesn't pay the compile
    b = model.meta["batch_size"]
    w, h = model.meta["image_size"]
    model(np.zeros((b, h, w, 15), np.float32), np.ones((b, 4), np.float32))

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/health":
                self._send(200, model.meta)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                arrays = np.load(io.BytesIO(self.rfile.read(length)))
                self._send(200, _predict(model, arrays))
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet; tests capture stdout
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--platform", default=None,
                    help="pin the jax backend (e.g. 'cpu', 'tpu'); default "
                         "lets jax pick.  Must be set before any jax import, "
                         "hence a flag here rather than an env var the "
                         "artifact loader would read too late.")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    srv = make_server(args.artifact, args.host, args.port)
    print(f"serving {args.artifact} on http://{args.host}:{srv.server_port}",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
