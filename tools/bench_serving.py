#!/usr/bin/env python3
"""Serving-path benchmark: exported StableHLO artifact latency/throughput.

Deserializes an `export_model.py` artifact (no model code — the production
serving path) and measures per-request latency and throughput of the
embedding forward on the default device.  Every timed request SYNCS TO
HOST (fetches one output scalar) before the next is issued — the
request/response pattern a serving frontend actually sees.  Async
wall-clock timing is useless on this backend even with a device-side data
dependency chained through calls (measured 0.04 ms/call for a forward
whose device time is ~100x that; cf. SPEED.md "Measurement gotcha") —
only a host sync per call gives an honest per-request number.

Usage: python tools/bench_serving.py ARTIFACT [--size 32] [--batches 1,32,256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batches", type=str, default="1,32,256")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import export as jexport

    with open(args.artifact, "rb") as f:
        fn = jexport.deserialize(f.read())

    rng = np.random.default_rng(0)
    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        x0 = jnp.asarray(
            rng.normal(0, 1, (b, args.size, args.size, 3)).astype(np.float32))

        @jax.jit
        def step(x, feedback):
            out = fn.call(x + feedback)
            first = jax.tree_util.tree_leaves(out)[0]
            return out, first.ravel()[0] * 1e-6

        out, fb = step(x0, jnp.float32(0.0))  # compile + warm
        for _ in range(3):
            out, fb = step(x0, fb)
        jax.block_until_ready(out)

        best = np.inf
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out, fb = step(x0, fb)
                fb = jnp.float32(float(fb))  # host sync: request/response
            best = min(best, time.perf_counter() - t0)
        per_call_ms = best / args.steps * 1e3
        results[f"batch_{b}"] = {
            "latency_ms": round(per_call_ms, 3),
            "img_per_sec": round(b * args.steps / best, 1),
        }
        print(f"batch {b}: {per_call_ms:.3f} ms/call, "
              f"{b * args.steps / best:,.0f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
