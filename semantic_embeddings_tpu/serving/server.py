"""HTTP serving frontend over the batching engine.

Stdlib-only (``http.server``) so the serving runtime has zero extra
dependencies.  Endpoints:

- ``GET /healthz``            → ``{"status": "ok"}``
- ``GET /v1/meta``            → model metadata (sidecar of the artifact)
- ``GET /v1/stats``           → engine counters + latency quantiles
- ``POST /v1/predict``        → inference.  Request body:
    * ``application/json``: ``{"instances": <nested list>}`` — one image
      ``(H, W, C)`` or a batch ``(n, H, W, C)``, raw pixel floats; the
      server applies the configured mean/std normalization unless
      ``"normalized": true`` is set in the payload.
    * ``image/jpeg``: raw JPEG bytes — decoded by the native C++ decoder
      (in-memory; resize shorter side + center crop to the model input),
      then normalized.
    * ``application/x-npy``: a serialized numpy array, same semantics as
      ``instances``.
  Response: ``{"predictions": ...}`` JSON (or ``application/x-npy`` when
  the request sets ``Accept: application/x-npy`` and the model returns a
  single array).

Counterpart-by-role of the reference's offline ``predict_generator``
feature dumps (``/root/reference/learn_image_embeddings.py:269-275``) —
the reference has no online serving path at all.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax

from .engine import EngineOverloaded


class PreprocessError(ValueError):
    pass


class Preprocessor:
    """Host-side request preprocessing: JPEG decode (+ normalize).

    ``device_norm``: mean/std normalization happens ON DEVICE (baked into
    the engine's fn by ``serve_model --device_preproc``); this side then
    emits raw uint8 pixels — 4x less host->device transfer and no
    per-image host float math.  Pre-normalized array requests are
    rejected in this mode (the device would normalize them again).
    """

    def __init__(self, input_size, input_channels=3, mean=None, std=None,
                 target_size=None, n_threads=4, device_norm=False):
        self.input_size = int(input_size)
        self.input_channels = int(input_channels)
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)
        # shorter-side resize target before the center crop (defaults to
        # the crop size itself, the reference's test-time convention)
        self.target_size = int(target_size or input_size)
        self.n_threads = n_threads
        self.device_norm = bool(device_norm)

    def normalize(self, x):
        x = np.asarray(x, np.float32)
        if self.mean is not None:
            x = x - self.mean
        if self.std is not None:
            x = x / self.std
        return x

    def from_jpeg(self, blob):
        from .. import native

        if native.loader() is not None:
            imgs, ok = native.decode_mem_batch(
                [blob], [self.target_size], [1], 0, self.input_size,
                self.input_size, self.n_threads)
            if not ok[0]:
                raise PreprocessError("could not decode JPEG body")
            img = imgs[0]
        else:  # PIL fallback (mirrors data/files.py's fallback path)
            from PIL import Image

            try:
                pil = Image.open(io.BytesIO(blob)).convert("RGB")
            except Exception as e:
                raise PreprocessError(f"could not decode image: {e}") from e
            w, h = pil.size
            s = self.target_size / min(w, h)
            pil = pil.resize((max(1, round(w * s)), max(1, round(h * s))))
            img = np.asarray(pil, dtype=np.uint8)
            y0 = max(0, (img.shape[0] - self.input_size) // 2)
            x0 = max(0, (img.shape[1] - self.input_size) // 2)
            img = img[y0:y0 + self.input_size, x0:x0 + self.input_size]
        if self.device_norm:
            return img[None]  # uint8; device fn normalizes
        return self.normalize(img[None].astype(np.float32))

    def from_array(self, arr, normalized=False):
        if self.device_norm:
            if normalized:
                raise PreprocessError(
                    "this server normalizes on device (--device_preproc); "
                    "send raw pixel values, not pre-normalized arrays")
            arr = np.asarray(arr)
            if arr.ndim == 3:
                arr = arr[None]
            want = (self.input_size, self.input_size, self.input_channels)
            if arr.ndim != 4 or arr.shape[1:] != want:
                raise PreprocessError(
                    f"bad input shape {arr.shape}; expected (n,) + {want}")
            if arr.dtype != np.uint8:
                # pixel-valued floats round-trip exactly; anything outside
                # [0, 255] was not raw pixels
                arr = np.clip(np.rint(arr.astype(np.float32)), 0, 255)
                arr = arr.astype(np.uint8)
            return arr
        arr = np.asarray(arr, dtype=np.float32)
        if arr.ndim == 3:  # single image HWC
            arr = arr[None]
        want = (self.input_size, self.input_size, self.input_channels)
        if arr.ndim != 4 or arr.shape[1:] != want:
            raise PreprocessError(
                f"bad input shape {arr.shape}; expected (n,) + {want}")
        return arr if normalized else self.normalize(arr)


def _json_bytes(obj):
    return json.dumps(obj).encode("utf-8")


def make_handler(engine, preproc, meta, request_timeout=60.0):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code, obj):
            self._send(code, _json_bytes(obj))

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/v1/meta":
                self._send_json(200, meta)
            elif self.path == "/v1/stats":
                self._send_json(200, engine.stats())
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/predict":
                self._send_json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or
                         "application/json").split(";")[0].strip()
                if ctype == "image/jpeg":
                    x = preproc.from_jpeg(body)
                elif ctype == "application/x-npy":
                    arr = np.load(io.BytesIO(body), allow_pickle=False)
                    x = preproc.from_array(arr)
                else:
                    payload = json.loads(body or b"{}")
                    if "instances" not in payload:
                        raise PreprocessError('missing "instances" key')
                    x = preproc.from_array(
                        payload["instances"],
                        normalized=bool(payload.get("normalized", False)))
            except (PreprocessError, ValueError, json.JSONDecodeError) as e:
                self._send_json(400, {"error": str(e)})
                return

            try:
                out = engine.predict(x, timeout=request_timeout)
            except EngineOverloaded as e:  # queue full: tell caller to back off
                self.send_response(503)
                self.send_header("Retry-After", "1")
                body503 = _json_bytes({"error": str(e)})
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body503)))
                self.end_headers()
                self.wfile.write(body503)
                return
            except ValueError as e:   # e.g. batch > max_batch
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 - model/runtime failure
                self._send_json(500, {"error": repr(e)})
                return

            leaves = jax.tree_util.tree_leaves(out)
            if (self.headers.get("Accept") == "application/x-npy"
                    and len(leaves) == 1):
                buf = io.BytesIO()
                np.save(buf, np.asarray(leaves[0]), allow_pickle=False)
                self._send(200, buf.getvalue(), "application/x-npy")
                return
            if len(leaves) == 1:
                resp = {"predictions": np.asarray(leaves[0]).tolist()}
            else:
                resp = {"predictions": jax.tree_util.tree_map(
                    lambda a: np.asarray(a).tolist(), out)}
            self._send_json(200, resp)

    return Handler


class _Listener(ThreadingHTTPServer):
    # Python's default listen backlog is 5: a burst of concurrent clients
    # beyond that gets TCP connection resets before the accept loop runs.
    # A batching server EXPECTS bursts — that's what it batches.
    request_queue_size = 128


class ServingServer:
    """Owns the HTTP listener + batching engine lifecycle."""

    def __init__(self, engine, preproc, meta, host="127.0.0.1", port=8000,
                 request_timeout=60.0):
        self.engine = engine
        handler = make_handler(engine, preproc, meta, request_timeout)
        self.httpd = _Listener((host, port), handler)
        self.httpd.daemon_threads = True
        self._thread = None

    @property
    def port(self):
        return self.httpd.server_address[1]

    def start(self):
        self.engine.start()
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="sed-http")
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self.engine.stop()

    def serve_forever(self):
        self.engine.start()
        try:
            self.httpd.serve_forever()
        finally:
            self.stop()
