#!/usr/bin/env python3
"""End-to-end HTTP serving benchmark: client -> server -> batcher -> device.

Starts the real ``serve_model`` server in-process on an artifact or
checkpoint and drives it with N concurrent closed-loop clients
(``ServingClient``, binary npy round trips).  Reports requests/s, img/s,
and the batcher's measured occupancy at each concurrency level — the
dynamic micro-batching win is visible as img/s scaling with concurrency
while the device sees a shrinking number of larger calls.

    python tools/bench_serving_http.py --artifact model.shlo [--size 32]
        [--concurrency 1,8,32] [--per_client 20] [--req_batch 1]

Per-request latency on this environment includes the axon tunnel RTT
(SPEED.md "Serving path"); throughput at high concurrency amortizes it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layer", default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--concurrency", default="1,8,32")
    ap.add_argument("--per_client", type=int, default=20)
    ap.add_argument("--req_batch", type=int, default=1,
                    help="Images per request.")
    ap.add_argument("--max_batch", type=int, default=256)
    ap.add_argument("--batch_timeout_ms", type=float, default=2.0)
    args = ap.parse_args()

    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.serving import ServingClient

    srv_args = ["--port", "0", "--max_batch", str(args.max_batch),
                "--batch_timeout_ms", str(args.batch_timeout_ms),
                "--mean", "0,0,0", "--std", "1,1,1"]
    if args.artifact:
        srv_args += ["--artifact", args.artifact]
    else:
        srv_args += ["--checkpoint", args.checkpoint]
        if args.layer:
            srv_args += ["--layer", args.layer]
    if args.size:
        srv_args += ["--input_size", str(args.size)]
    server = make_server(build_parser().parse_args(srv_args))
    server.start()
    size = server.engine.input_tail[0]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.req_batch, size, size, 3)).astype(np.float32)

    try:
        client = ServingClient(f"http://127.0.0.1:{server.port}",
                               timeout=300.0)
        # Pre-compile every batch bucket so XLA compiles land outside the
        # timed windows (one warm request per bucket size).
        for b in server.engine.buckets:
            client.predict(np.zeros((b,) + server.engine.input_tail,
                                    np.float32))
        results = {}
        for conc in [int(c) for c in args.concurrency.split(",")]:
            # warm the bucket this concurrency level will hit
            before = server.engine.stats()
            errors = []

            def worker():
                c = ServingClient(f"http://127.0.0.1:{server.port}",
                                  timeout=300.0)
                for _ in range(args.per_client):
                    try:
                        c.predict(x)
                    except Exception as e:  # noqa: BLE001
                        errors.append(e)
                        return

            threads = [threading.Thread(target=worker)
                       for _ in range(conc)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            if errors:
                raise errors[0]
            after = server.engine.stats()
            n_req = conc * args.per_client
            n_img = n_req * args.req_batch
            n_dev = after["batches"] - before["batches"]
            results[f"conc_{conc}"] = {
                "req_per_sec": round(n_req / dt, 1),
                "img_per_sec": round(n_img / dt, 1),
                "device_calls": n_dev,
                "avg_device_batch": round(
                    (after["images"] - before["images"]) / max(n_dev, 1), 1),
                "wall_s": round(dt, 3),
            }
            print(f"concurrency {conc:3d}: "
                  f"{results[f'conc_{conc}']['req_per_sec']:8.1f} req/s  "
                  f"{results[f'conc_{conc}']['img_per_sec']:8.1f} img/s  "
                  f"{n_dev} device calls "
                  f"(avg batch {results[f'conc_{conc}']['avg_device_batch']})",
                  flush=True)
        print(json.dumps(results))
    finally:
        server.stop()


if __name__ == "__main__":
    main()
