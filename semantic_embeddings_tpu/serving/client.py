"""Minimal stdlib client for the serving HTTP API.

Counterpart of ``serving/server.py``'s wire formats; kept dependency-free
(urllib + numpy) so downstream services can vendor it.  The npy
content-type is the efficient path: one binary round trip, no JSON
number parsing.

    client = ServingClient("http://localhost:8000")
    emb = client.predict(images)          # (n, H, W, C) float32 -> array
    emb = client.predict_jpeg(jpeg_bytes) # raw encoded image
    client.health(), client.meta(), client.stats()
"""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request

import numpy as np


class ServingError(RuntimeError):
    """Server returned an error status; carries code and server message."""

    def __init__(self, code, message):
        super().__init__(f"HTTP {code}: {message}")
        self.code = code


class ServingClient:
    def __init__(self, base_url, timeout=60.0, retries=0, retry_backoff=0.2):
        """``retries``: extra attempts after a retryable failure — HTTP 503
        (the server's backpressure signal when the pending-image queue is
        full), other 5xx, and connection-level errors.  4xx responses are
        never retried (the request itself is bad).  ``retry_backoff``:
        initial sleep in seconds, doubled per attempt."""
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.retries = int(retries)
        self.retry_backoff = float(retry_backoff)

    # -- internals -----------------------------------------------------------

    def _request_once(self, path, body=None, ctype=None, accept=None):
        headers = {}
        if ctype:
            headers["Content-Type"] = ctype
        if accept:
            headers["Accept"] = accept
        req = urllib.request.Request(
            self.base_url + path, data=body, headers=headers,
            method="POST" if body is not None else "GET",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.headers.get("Content-Type"), resp.read()
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                message = json.loads(raw).get("error", raw.decode(
                    errors="replace"))
            except Exception:  # noqa: BLE001 - non-JSON error body
                message = raw.decode(errors="replace")
            raise ServingError(e.code, message) from None

    def _request(self, path, body=None, ctype=None, accept=None):
        import time

        delay = self.retry_backoff
        for attempt in range(self.retries + 1):
            try:
                return self._request_once(path, body, ctype, accept)
            except ServingError as e:
                if attempt >= self.retries or e.code < 500:
                    raise
            except urllib.error.URLError:
                if attempt >= self.retries:
                    raise
            time.sleep(delay)
            delay *= 2

    def _get_json(self, path):
        _, body = self._request(path)
        return json.loads(body)

    # -- API -----------------------------------------------------------------

    def health(self):
        return self._get_json("/healthz")

    def meta(self):
        return self._get_json("/v1/meta")

    def stats(self):
        return self._get_json("/v1/stats")

    def predict(self, images, normalized=False, wire_dtype=np.float32):
        """``images``: (n, H, W, C) or (H, W, C) float array.  Uses the
        binary npy round trip; ``normalized=True`` skips the server's
        mean/std normalization (npy requests are always raw pixels —
        pre-normalized arrays should go through ``predict_json``).
        ``wire_dtype=np.uint8`` sends raw pixels at 1/4 the bytes —
        lossless for integer pixel values and the natural pairing with a
        ``--device_preproc`` server."""
        if normalized:
            return np.asarray(self.predict_json(images, normalized=True),
                              dtype=np.float32)
        buf = io.BytesIO()
        np.save(buf, np.asarray(images, dtype=wire_dtype),
                allow_pickle=False)
        ctype, body = self._request(
            "/v1/predict", buf.getvalue(), "application/x-npy",
            accept="application/x-npy")
        if ctype == "application/x-npy":
            return np.load(io.BytesIO(body), allow_pickle=False)
        # multi-output models answer in JSON regardless of Accept
        return json.loads(body)["predictions"]

    def predict_json(self, images, normalized=False):
        """JSON round trip (slower; supports the ``normalized`` flag)."""
        payload = {"instances": np.asarray(images, dtype=np.float32).tolist(),
                   "normalized": bool(normalized)}
        _, body = self._request(
            "/v1/predict", json.dumps(payload).encode("utf-8"),
            "application/json")
        return json.loads(body)["predictions"]

    def predict_jpeg(self, blob):
        """Raw encoded JPEG bytes; the server decodes in-memory (native
        C++ decoder), resizes, center-crops, and normalizes."""
        _, body = self._request("/v1/predict", bytes(blob), "image/jpeg")
        return np.asarray(json.loads(body)["predictions"], dtype=np.float32)
