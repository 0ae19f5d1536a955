#!/usr/bin/env python3
"""Dense-block formulation probe: concat chain vs preallocated buffer.

The densenet-100-12 train-step trace (tools/probe_zoo_trace.py) shows the
step dominated by materialized `concatenate` ops at ~25% of HBM peak: the
classic `x = concat([x, y])` chain re-writes the whole growing feature
prefix at every layer (O(L^2) writes).  The candidate fix keeps ONE
preallocated (B, H, W, C_final) buffer and writes each layer's k new
channels in place (`buf.at[..., off:off+k].set(y)` -> dynamic-update-slice,
aliasable by XLA), while layers read the static prefix slice — numerically
identical, O(L^2) reads (inherent to DenseNet) but O(L*k) writes.

    python tools/probe_densenet_concat.py [--batch 256] [--layers 32]
        [--growth 12] [--c0 24] [--size 32] [--steps 10]

Measures fwd+bwd wall time of one dense block, both formulations, and
asserts they produce identical losses/grads.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_params(rng, layers, c0, growth):
    params = []
    for l in range(layers):
        cin = c0 + l * growth
        params.append(dict(
            scale=np.ones((cin,), np.float32),
            bias=np.zeros((cin,), np.float32),
            kernel=(rng.normal(0, 0.05, (3, 3, cin, growth))
                    .astype(np.float32)),
        ))
    return params


def bn_relu_conv(jnp, lax, x, p, dtype):
    # inference-style BN (scale/bias only) + ReLU + 3x3 SAME conv, like the
    # traced train step's per-layer work (stats add reduces on top in both
    # formulations equally; this probe isolates the concat-vs-buffer delta).
    m = x.astype(jnp.float32).mean(axis=(0, 1, 2))
    v = (x.astype(jnp.float32) ** 2).mean(axis=(0, 1, 2)) - m ** 2
    h = (x.astype(jnp.float32) - m) * lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]
    h = jnp.maximum(h, 0.0).astype(dtype)
    return lax.conv_general_dilated(
        h, p["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--growth", type=int, default=12)
    ap.add_argument("--c0", type=int, default=24)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        jnp.asarray, make_params(rng, args.layers, args.c0, args.growth))
    x0 = jnp.asarray(rng.normal(
        0, 1, (args.batch, args.size, args.size, args.c0)).astype(np.float32))
    c_final = args.c0 + args.layers * args.growth

    def loss_concat(params, x):
        x = x.astype(dtype)
        for p in params:
            y = bn_relu_conv(jnp, lax, x, p, dtype)
            x = jnp.concatenate([x, y], axis=-1)
        return (x.astype(jnp.float32) ** 2).mean()

    def loss_buffer(params, x):
        buf = jnp.zeros(x.shape[:3] + (c_final,), dtype)
        buf = buf.at[..., : args.c0].set(x.astype(dtype))
        for l, p in enumerate(params):
            cin = args.c0 + l * args.growth
            y = bn_relu_conv(jnp, lax, buf[..., :cin], p, dtype)
            buf = buf.at[..., cin: cin + args.growth].set(y)
        return (buf.astype(jnp.float32) ** 2).mean()

    results = {}
    for name, fn in [("concat", loss_concat), ("buffer", loss_buffer)]:
        vg = jax.jit(jax.value_and_grad(fn))
        (l0, g0) = vg(params, x0)
        jax.block_until_ready(g0)
        results[name] = (float(l0), g0)
        # timed: chain a data dependency through steps (SPEED.md gotcha)
        @jax.jit
        def step(params, x, fb):
            l, g = jax.value_and_grad(fn)(params, x)
            return l, g, x + l.astype(x.dtype) * 1e-9
        l, g, xc = step(params, x0, x0)
        jax.block_until_ready(l)
        best = np.inf
        for _ in range(args.windows):
            t0 = time.perf_counter()
            xc = x0
            for _ in range(args.steps):
                l, g, xc = step(params, xc, xc)
            jax.block_until_ready(l)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1e3
        print(f"{name}: {ms:.2f} ms/step (fwd+bwd, batch {args.batch}, "
              f"{args.layers} layers, growth {args.growth})", flush=True)

    l_a, g_a = results["concat"]
    l_b, g_b = results["buffer"]
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-4)
    print("numerics: identical (loss exact to 1e-5, grads match)")


if __name__ == "__main__":
    main()
