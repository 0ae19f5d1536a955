"""Dynamic micro-batching engine for the serving runtime.

The reference has no serving story beyond ``model.save('.h5')``
(``/root/reference/learn_image_embeddings.py:257-267``); this is the
TPU-native production counterpart.  Concurrent requests are coalesced
into one device call: a dispatcher thread drains the request queue until
either ``max_batch`` images are pending or ``timeout_ms`` has elapsed
since the first queued request, pads the pack to the smallest configured
batch *bucket* (XLA compiles one program per static shape — buckets keep
the compile set small and every call's shape static), runs the model
once, and scatters per-request slices back through futures.

Throughput comes from batching (one dispatch + one MXU-efficient batch
instead of N tiny ones); the padding rows are the price and are bounded
by the bucket spacing (powers of two by default).
"""

from __future__ import annotations

import collections
import queue
import threading
import time

import numpy as np

import jax


class _Pending:
    __slots__ = ("array", "future", "t_enqueue")

    def __init__(self, array, future):
        self.array = array
        self.future = future
        self.t_enqueue = time.perf_counter()


class Future:
    """Minimal thread-safe future (stdlib concurrent.futures carries
    executor baggage we don't need)."""

    def __init__(self):
        self._event = threading.Event()
        self._value = None
        self._error = None

    def set_result(self, value):
        self._value = value
        self._event.set()

    def set_exception(self, err):
        self._error = err
        self._event.set()

    def result(self, timeout=None):
        if not self._event.wait(timeout):
            raise TimeoutError("request did not complete in time")
        if self._error is not None:
            # A device-call error is delivered to EVERY waiter of the pack;
            # raising the shared instance would let concurrent waiters
            # mutate each other's traceback — raise a per-waiter copy
            # chained to the original instead.
            err = self._error
            try:
                copy = type(err)(*err.args)
            except Exception:  # noqa: BLE001 - exotic ctor signature
                copy = RuntimeError(f"{type(err).__name__}: {err}")
            raise copy from err
        return self._value


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the pending-image queue is full (the HTTP
    layer maps this to 503 so callers can back off instead of timing out)."""


def default_buckets(max_batch, multiple=1):
    """``multiple`` times powers of two, up to and including max_batch.

    ``multiple`` > 1 is the mesh case: every device call must shard its
    batch axis evenly over the data-parallel mesh, so the smallest bucket
    is one image per chip."""
    buckets, b = [], multiple
    while b < max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(max_batch)
    return buckets


class BatchingEngine:
    """Coalesces concurrent inference requests into bucketed device calls.

    ``fn``: callable mapping a ``dtype`` ``(B, *input_tail)`` array to a
    pytree of arrays with leading batch dimension ``B``.  It is called
    only with ``B in buckets``.

    ``dtype`` (default float32): the wire/buffer dtype handed to ``fn``.
    With device-side preprocessing (``serve_model --device_preproc``) this
    is uint8 — 4x less host->device transfer per image, the dominant
    serving cost at 224 px on a remote-dispatch backend.
    """

    def __init__(self, fn, input_tail, max_batch=256, timeout_ms=2.0,
                 buckets=None, mesh=None, max_queue=None, dtype=np.float32):
        """``mesh``: a ``jax.sharding.Mesh`` — each device call's batch is
        sharded across the mesh (data axis; height additionally on the
        spatial axis if present), so one HTTP frontend drives every chip
        SPMD.  Buckets become multiples of the shard count.

        ``max_queue``: cap on pending images; beyond it submit() raises
        :class:`EngineOverloaded` (HTTP 503) instead of queueing unbounded
        work.  Default: 16 full batches.
        """
        self._fn = fn
        self.input_tail = tuple(input_tail)
        self.dtype = np.dtype(dtype)
        self.max_batch = int(max_batch)
        self.timeout_s = float(timeout_ms) / 1e3
        self.mesh = mesh
        self._sharding = None
        n_shard = 1
        if mesh is not None:
            from ..parallel import batch_sharding, image_sharding

            n_shard = int(dict(mesh.shape).get("data", mesh.devices.size))
            self._sharding = (image_sharding(mesh)
                              if len(self.input_tail) == 3
                              else batch_sharding(mesh))
            if self.max_batch % n_shard:
                raise ValueError(
                    f"max_batch {self.max_batch} must be a multiple of the "
                    f"mesh's {n_shard}-way data axis")
        self.buckets = (sorted(buckets) if buckets
                        else default_buckets(max_batch, multiple=n_shard))
        if self.buckets[-1] < self.max_batch:
            raise ValueError("largest bucket must cover max_batch")
        if mesh is not None and any(b % n_shard for b in self.buckets):
            raise ValueError(
                f"every bucket must divide over the {n_shard}-way data axis")
        self.max_queue = (int(max_queue) if max_queue is not None
                          else 16 * self.max_batch)
        self._n_pending = 0
        self._queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = None
        self._lock = threading.Lock()
        self._stats = dict(requests=0, images=0, batches=0, padded_images=0,
                           errors=0)
        self._latencies = collections.deque(maxlen=1024)

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="sed-batcher")
        self._thread.start()
        return self

    def stop(self):
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=10)
            self._thread = None
        # fail whatever is still queued
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            with self._lock:
                self._n_pending -= item.array.shape[0]
            item.future.set_exception(RuntimeError("engine stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- request API -------------------------------------------------------

    def submit(self, x):
        """Enqueue a ``(n, *input_tail)`` array (cast to the engine dtype);
        returns a Future resolving to the pytree of per-request outputs
        (leading dim n)."""
        x = np.asarray(x, dtype=self.dtype)
        if x.shape[1:] != self.input_tail:
            raise ValueError(
                f"bad input shape {x.shape}; expected (n, "
                f"{', '.join(map(str, self.input_tail))})")
        if not (1 <= x.shape[0] <= self.max_batch):
            raise ValueError(
                f"request batch {x.shape[0]} outside [1, {self.max_batch}]")
        with self._lock:
            if self._n_pending + x.shape[0] > self.max_queue:
                raise EngineOverloaded(
                    f"{self._n_pending} images already pending "
                    f"(max_queue {self.max_queue}); retry later")
            self._n_pending += x.shape[0]
        fut = Future()
        self._queue.put(_Pending(x, fut))
        return fut

    def predict(self, x, timeout=None):
        """Synchronous submit + wait."""
        if self._thread is None:
            raise RuntimeError("engine not started")
        return self.submit(x).result(timeout)

    def warmup(self, buckets=None):
        """Pre-compiles every batch bucket by running the model on zeros,
        so no live request ever pays a first-hit XLA compile (seconds to
        minutes over the tunneled backend).  Runs inline on the caller's
        thread — call before serving traffic.  Returns per-bucket seconds."""
        timings = {}
        for b in (sorted(buckets) if buckets else self.buckets):
            x = np.zeros((b,) + self.input_tail, dtype=self.dtype)
            if self._sharding is not None:
                x = jax.device_put(x, self._sharding)
            t0 = time.perf_counter()
            out = self._fn(x)
            jax.tree_util.tree_map(np.asarray, out)  # block until done
            timings[int(b)] = round(time.perf_counter() - t0, 3)
        return timings

    def stats(self):
        with self._lock:
            out = dict(self._stats)
            out["pending_images"] = self._n_pending
            out["max_queue"] = self.max_queue
            lats = sorted(self._latencies)
        if lats:
            out["latency_ms_p50"] = round(1e3 * lats[len(lats) // 2], 3)
            out["latency_ms_p99"] = round(1e3 * lats[int(len(lats) * 0.99)], 3)
        out["avg_batch"] = round(out["images"] / max(out["batches"], 1), 2)
        return out

    # -- dispatcher --------------------------------------------------------

    def _bucket_for(self, n):
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            pack = [first]
            total = first.array.shape[0]
            deadline = time.perf_counter() + self.timeout_s
            while total < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if total + nxt.array.shape[0] > self.max_batch:
                    # would overflow: run it in the next pack
                    self._queue.put(nxt)
                    break
                pack.append(nxt)
                total += nxt.array.shape[0]
            self._run_pack(pack, total)

    def _run_pack(self, pack, total):
        bucket = self._bucket_for(total)
        batch = np.zeros((bucket,) + self.input_tail, dtype=self.dtype)
        off = 0
        for item in pack:
            n = item.array.shape[0]
            batch[off:off + n] = item.array
            off += n
        with self._lock:
            self._n_pending -= total
        try:
            x = batch
            if self._sharding is not None:
                # one host feeds the whole mesh: the jitted forward runs
                # SPMD with the batch (and image height, if spatial) sharded
                x = jax.device_put(batch, self._sharding)
            out = self._fn(x)
            # force to host once for the whole pack
            out = jax.tree_util.tree_map(np.asarray, out)
        except Exception as e:  # noqa: BLE001 - deliver to all waiters
            with self._lock:
                self._stats["errors"] += len(pack)
            for item in pack:
                item.future.set_exception(e)
            return
        now = time.perf_counter()
        off = 0
        for item in pack:
            n = item.array.shape[0]
            lo = off
            item.future.set_result(
                jax.tree_util.tree_map(lambda a: a[lo:lo + n], out))
            off += n
        with self._lock:
            self._stats["requests"] += len(pack)
            self._stats["images"] += total
            self._stats["batches"] += 1
            self._stats["padded_images"] += bucket - total
            for item in pack:
                self._latencies.append(now - item.t_enqueue)
