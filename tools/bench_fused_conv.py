#!/usr/bin/env python3
"""On-chip benchmark: Pallas fused conv3x3+BN-stats vs XLA at RN50 shapes.

    python tools/bench_fused_conv.py [--shapes stage1,stage2,stage3,stage4]

Times (a) the fused Pallas kernel and (b) the unfused XLA chain
(conv -> bf16 round -> f32 stats reduce) on identical inputs, chaining a
data dependency through iterations (this backend under-reports repeated
identical dispatches; see SPEED.md "Measurement gotcha").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, B, H, W, C, F): ResNet-50 @224 3x3 conv shapes (the mid conv of
# each bottleneck stage), batch 128
SHAPES = {
    "stage1": (128, 56, 56, 64, 64),
    "stage2": (128, 28, 28, 128, 128),
    "stage3": (128, 14, 14, 256, 256),
    "stage4": (128, 7, 7, 512, 512),
}


def time_fn(fn, *args, iters=20):
    """Chained timing: each iteration's input depends on the previous
    output so the backend cannot overlap identical dispatches."""
    import jax
    import jax.numpy as jnp

    x = args[0]
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = out[0] if isinstance(out, (tuple, list)) else out
        # fold a tiny data dependency back into x (cast keeps dtype)
        x = (x + y[..., :1].astype(x.dtype) * 0).astype(x.dtype) if (
            y.shape[:3] == x.shape[:3]) else x
        out = fn(x, *args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", type=str, default="stage1,stage2,stage3,stage4")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch_tile", type=int, default=1)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tools.fused_conv_bn_prototype import (
        conv3x3_bn_stats,
        conv3x3_bn_stats_reference,
    )

    ref = jax.jit(conv3x3_bn_stats_reference)
    rng = np.random.default_rng(0)
    for name in args.shapes.split(","):
        B, H, W, C, F = SHAPES[name]
        x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, F)), jnp.bfloat16)
        # correctness on-chip first
        import functools
        fused = functools.partial(conv3x3_bn_stats, batch_tile=args.batch_tile)
        y, s, ss = fused(x, w)
        yr, sr, ssr = ref(x, w)
        err = float(jnp.abs(s - sr).max() / (jnp.abs(sr).max() + 1e-9))
        t_fused = time_fn(fused, x, w, iters=args.iters)
        t_ref = time_fn(ref, x, w, iters=args.iters)
        flops = 2 * B * H * W * 9 * C * F
        print(
            f"{name}: fused {t_fused * 1e3:7.3f} ms ({flops / t_fused / 1e12:5.1f} TF/s)  "
            f"xla-unfused {t_ref * 1e3:7.3f} ms ({flops / t_ref / 1e12:5.1f} TF/s)  "
            f"ratio {t_ref / t_fused:4.2f}x  stats rel-err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
