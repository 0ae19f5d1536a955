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
    ap.add_argument("--body", choices=("npy", "json", "jpeg"), default="npy",
                    help="Request body type (jpeg implies one image per "
                         "request and exercises the native in-memory "
                         "decoder).")
    ap.add_argument("--soak", type=int, default=0,
                    help="After the concurrency sweep, run one sustained "
                         "phase of this many TOTAL requests at the last "
                         "concurrency level, sampling the process RSS and "
                         "open-fd count every 2 s — the leak watch for the "
                         "serving certificate.")
    ap.add_argument("--device_preproc", action="store_true",
                    help="Serve with uint8-wire device-side normalization "
                         "(npy bodies are sent as uint8 raw pixels).")
    ap.add_argument("--mean", default="0,0,0",
                    help="Server channel mean (identity by default, matching "
                         "the r3 certificates; pass recipe stats for the "
                         "realistic normalize-on-serve condition).")
    ap.add_argument("--std", default="1,1,1")
    ap.add_argument("--cpu", action="store_true",
                    help="Force the CPU backend (smoke runs).")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.serving import ServingClient

    srv_args = ["--port", "0", "--max_batch", str(args.max_batch),
                "--batch_timeout_ms", str(args.batch_timeout_ms),
                "--mean", args.mean, "--std", args.std]
    if args.device_preproc:
        srv_args.append("--device_preproc")
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
    x = rng.integers(
        0, 256, size=(args.req_batch, size, size, 3)).astype(
            np.uint8 if args.device_preproc else np.float32)
    jpeg_blob = None
    if args.body == "jpeg":
        if args.req_batch != 1:
            raise SystemExit("--body jpeg is one image per request")
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, size=(size, size, 3)).astype(np.uint8)
        ).save(buf, "JPEG", quality=90)
        jpeg_blob = buf.getvalue()

    def one_request(c):
        if args.body == "jpeg":
            c.predict_jpeg(jpeg_blob)
        elif args.body == "json":
            c.predict_json(x)
        elif args.device_preproc:
            c.predict(x, wire_dtype=np.uint8)  # 1/4 the request bytes
        else:
            c.predict(x)

    def rss_fds():
        with open("/proc/self/status") as f:
            rss_kb = next(
                int(line.split()[1]) for line in f
                if line.startswith("VmRSS:")
            )
        return rss_kb / 1024.0, len(os.listdir("/proc/self/fd"))

    def run_level(conc, per_client, sample_health=False):
        """One closed-loop phase; returns the metrics dict."""
        before = server.engine.stats()
        errors = []
        latencies = []
        lat_lock = threading.Lock()
        samples = []
        stop_sampler = threading.Event()

        def sampler():
            while not stop_sampler.wait(2.0):
                samples.append(rss_fds())

        def worker():
            c = ServingClient(f"http://127.0.0.1:{server.port}",
                              timeout=300.0)
            lats = []
            for _ in range(per_client):
                try:
                    t0 = time.perf_counter()
                    one_request(c)
                    lats.append(time.perf_counter() - t0)
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                    return
            with lat_lock:
                latencies.extend(lats)

        threads = [threading.Thread(target=worker) for _ in range(conc)]
        sam = threading.Thread(target=sampler, daemon=True)
        rss0, fds0 = rss_fds()
        t0 = time.perf_counter()
        if sample_health:
            sam.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        stop_sampler.set()
        if sample_health:
            sam.join()
        if errors:
            raise errors[0]
        after = server.engine.stats()
        n_req = conc * per_client
        n_img = n_req * args.req_batch
        n_dev = after["batches"] - before["batches"]
        latencies.sort()
        out = {
            "req_per_sec": round(n_req / dt, 1),
            "img_per_sec": round(n_img / dt, 1),
            "device_calls": n_dev,
            "avg_device_batch": round(
                (after["images"] - before["images"]) / max(n_dev, 1), 1),
            "wall_s": round(dt, 3),
            "latency_ms_p50": round(1e3 * latencies[len(latencies) // 2], 2),
            "latency_ms_p95": round(
                1e3 * latencies[int(len(latencies) * 0.95)], 2),
            "latency_ms_p99": round(
                1e3 * latencies[min(int(len(latencies) * 0.99),
                                    len(latencies) - 1)], 2),
        }
        if sample_health:
            rss1, fds1 = rss_fds()
            rss_max = max([rss0] + [r for r, _ in samples] + [rss1])
            fds_max = max([fds0] + [f for _, f in samples] + [fds1])
            out["health"] = {
                "requests": n_req,
                "rss_mb_start": round(rss0, 1),
                "rss_mb_end": round(rss1, 1),
                "rss_mb_max": round(rss_max, 1),
                "fds_start": fds0, "fds_end": fds1, "fds_max": fds_max,
            }
        return out

    try:
        # Pre-compile every batch bucket so XLA compiles land outside the
        # timed windows (inline, bypassing the HTTP request timeout — a
        # cold large-bucket compile over the tunneled backend can take
        # minutes).
        timings = server.engine.warmup()
        print(f"warmup: {timings} s per bucket", flush=True)
        results = {"body": args.body}
        levels = [int(c) for c in args.concurrency.split(",")]
        for conc in levels:
            r = results[f"conc_{conc}"] = run_level(conc, args.per_client)
            print(f"concurrency {conc:3d}: "
                  f"{r['req_per_sec']:8.1f} req/s  "
                  f"{r['img_per_sec']:8.1f} img/s  "
                  f"p50 {r['latency_ms_p50']:7.2f} ms  "
                  f"p99 {r['latency_ms_p99']:7.2f} ms  "
                  f"{r['device_calls']} device calls "
                  f"(avg batch {r['avg_device_batch']})",
                  flush=True)
        if args.soak:
            conc = levels[-1]
            per_client = max(1, args.soak // conc)
            print(f"soak: {conc * per_client} requests at concurrency "
                  f"{conc} ...", flush=True)
            r = results["soak"] = run_level(conc, per_client,
                                            sample_health=True)
            print(f"soak: {r['req_per_sec']:.1f} req/s over {r['wall_s']} s; "
                  f"p50 {r['latency_ms_p50']} ms p99 {r['latency_ms_p99']} "
                  f"ms; RSS {r['health']['rss_mb_start']} -> "
                  f"{r['health']['rss_mb_end']} MB "
                  f"(max {r['health']['rss_mb_max']}); fds "
                  f"{r['health']['fds_start']} -> {r['health']['fds_end']} "
                  f"(max {r['health']['fds_max']})", flush=True)
        results["engine_stats"] = server.engine.stats()
        print(json.dumps(results))
    finally:
        server.stop()


if __name__ == "__main__":
    main()
