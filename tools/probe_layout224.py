#!/usr/bin/env python3
"""Probe: does conv layout choice explain the 224px-path reduce slowdown?

SPEED.md records that the ResNet-50 @224 train step's big BN/elementwise
reduce fusions run ~2.3-2.6x off the HBM roofline because XLA assigns
*mismatched* layouts ({3,0,2,1} vs {0,3,2,1}) to the tensors one fusion
reads.  This probe times an isolated 6-block bottleneck stage (stage-3
shape of ResNet-50 @224, batch 128, bf16) forward+backward with batch-norm
statistics, expressed three ways:

    nhwc-flax   exactly what the model zoo emits today (nn.Conv, NHWC)
    nhwc-lax    the same math hand-written with lax.conv_general_dilated
    nchw-lax    identical math with NCHW dimension numbers

Usage:  python tools/probe_layout224.py [--variant all] [--trace /tmp/t224]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

BATCH = 128
HW = 28
CIN = 512
F = 128
BLOCKS = 6
EPS = 1.001e-5


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def bn(x, gamma, beta, channel_axis, jnp):
    """BatchNorm (training mode): f32 stats over all non-channel axes."""
    axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axes, keepdims=True)
    var = (xf * xf).mean(axes, keepdims=True) - mean * mean
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + EPS))
    y = y * gamma.reshape(shape) + beta.reshape(shape)
    return y.astype(x.dtype)


def init_params(key, nchw: bool, jnp, jax):
    """Per-block params: three convs (1x1 CIN->F, 3x3 F->F, 1x1 F->CIN) + BN."""
    params = []
    keys = jax.random.split(key, BLOCKS * 3)
    for b in range(BLOCKS):
        k1, k2, k3 = keys[3 * b : 3 * b + 3]
        if nchw:  # OIHW
            w1 = jax.random.normal(k1, (F, CIN, 1, 1), jnp.bfloat16) * 0.05
            w2 = jax.random.normal(k2, (F, F, 3, 3), jnp.bfloat16) * 0.05
            w3 = jax.random.normal(k3, (CIN, F, 1, 1), jnp.bfloat16) * 0.05
        else:  # HWIO
            w1 = jax.random.normal(k1, (1, 1, CIN, F), jnp.bfloat16) * 0.05
            w2 = jax.random.normal(k2, (3, 3, F, F), jnp.bfloat16) * 0.05
            w3 = jax.random.normal(k3, (1, 1, F, CIN), jnp.bfloat16) * 0.05
        g1 = jnp.ones((F,), jnp.float32)
        g2 = jnp.ones((F,), jnp.float32)
        g3 = jnp.ones((CIN,), jnp.float32)
        z1 = jnp.zeros((F,), jnp.float32)
        z2 = jnp.zeros((F,), jnp.float32)
        z3 = jnp.zeros((CIN,), jnp.float32)
        params.append(dict(w1=w1, w2=w2, w3=w3, g1=g1, g2=g2, g3=g3,
                           z1=z1, z2=z2, z3=z3))
    return params


def stage_lax(params, x, nchw: bool, jax, jnp):
    from jax import lax

    if nchw:
        dn = lax.conv_dimension_numbers(x.shape, (F, CIN, 1, 1),
                                        ("NCHW", "OIHW", "NCHW"))
        caxis = 1
    else:
        dn = lax.conv_dimension_numbers(x.shape, (1, 1, CIN, F),
                                        ("NHWC", "HWIO", "NHWC"))
        caxis = 3

    def cv(x, w, pad):
        # No preferred_element_type: mirrors flax nn.Conv (bf16 in/out; the
        # MXU accumulates f32 internally), and keeps the transpose rule's
        # cotangent dtype consistent with the bf16 weights.
        return lax.conv_general_dilated(x, w, (1, 1), pad, dimension_numbers=dn)

    for p in params:
        y = cv(x, p["w1"], "VALID")
        y = jax.nn.relu(bn(y, p["g1"], p["z1"], caxis, jnp))
        y = cv(y, p["w2"], "SAME")
        y = jax.nn.relu(bn(y, p["g2"], p["z2"], caxis, jnp))
        y = cv(y, p["w3"], "VALID")
        y = bn(y, p["g3"], p["z3"], caxis, jnp)
        x = jax.nn.relu(y + x)
    return x


def build_flax_stage(jnp):
    import flax.linen as nn

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from semantic_embeddings_tpu.models.resnet import BottleneckBlock

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for b in range(BLOCKS):
                x = BottleneckBlock(features=F, dtype=jnp.bfloat16,
                                    name=f"b{b}")(x, train)
            return x

    return Stage()


def time_fn(step, params, x, jax, steps=30, windows=3):
    """Time a grad step, CHAINING params through an SGD-like update.

    On the remote axon backend, timing loops of *identical independent*
    dispatches under-report wildly (measured 0.36 ms/step wall for a
    program whose own device trace shows 13.9 ms/step): results of
    repeated identical executions are apparently served without
    re-executing.  Threading each step's grads back into the next step's
    params (like a real training loop, and like bench.py's state chain)
    forces every step to run; the wall numbers then match device traces.
    """
    import jax.numpy as jnp  # noqa: F401

    update = jax.jit(
        lambda p, g: jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
    )
    g = step(params, x)
    params = update(params, g)
    jax.block_until_ready(params)
    best = np.inf
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            g = step(params, x)
            params = update(params, g)
        jax.block_until_ready(params)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all",
                    choices=["all", "nhwc-flax", "nhwc-lax", "nchw-lax"])
    ap.add_argument("--trace", default=None,
                    help="base dir; per-variant traces at <dir>/<variant>")
    args = ap.parse_args()

    jax = _setup_jax()
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    results = {}

    variants = ([args.variant] if args.variant != "all"
                else ["nhwc-flax", "nhwc-lax", "nchw-lax"])

    for variant in variants:
        if variant == "nchw-lax":
            x = jax.random.normal(key, (BATCH, CIN, HW, HW), jnp.bfloat16)
        else:
            x = jax.random.normal(key, (BATCH, HW, HW, CIN), jnp.bfloat16)

        if variant == "nhwc-flax":
            stage = build_flax_stage(jnp)
            variables = jax.jit(
                lambda k: stage.init(k, jnp.zeros((1, HW, HW, CIN),
                                                  jnp.bfloat16), True)
            )(key)
            params = variables["params"]

            def loss_fn(params, x):
                y, _ = stage.apply({"params": params}, x, True,
                                   mutable=["batch_stats"])
                return jnp.mean(jnp.square(y.astype(jnp.float32)))
        else:
            params = init_params(key, variant == "nchw-lax", jnp, jax)

            def loss_fn(params, x, _nchw=(variant == "nchw-lax")):
                y = stage_lax(params, x, _nchw, jax, jnp)
                return jnp.mean(jnp.square(y.astype(jnp.float32)))

        step = jax.jit(jax.grad(loss_fn))
        t0 = time.perf_counter()
        g = step(params, x)
        jax.block_until_ready(g)
        compile_s = time.perf_counter() - t0

        dt = time_fn(step, params, x, jax)
        results[variant] = dt
        print(f"{variant:10s}  {dt * 1e3:8.3f} ms/step   (first call {compile_s:.1f}s)",
              flush=True)

        if args.trace:
            tdir = f"{args.trace.rstrip('/')}/{variant}"
            jax.profiler.start_trace(tdir)
            g = step(params, x)
            for _ in range(9):
                # Chain a dependency: identical independent dispatches are
                # served without re-executing on this backend (see time_fn).
                gl = jax.tree_util.tree_leaves(g)[0]
                x2 = x + (0 * gl.astype(x.dtype)).sum()
                g = step(params, x2)
            jax.block_until_ready(g)
            jax.profiler.stop_trace()
            print(f"  trace -> {tdir}", flush=True)

    if len(results) > 1:
        base = results.get("nhwc-flax") or max(results.values())
        for k, v in results.items():
            print(f"{k:10s} {base / v:5.2f}x vs nhwc-flax")


if __name__ == "__main__":
    main()
