#!/usr/bin/env python3
"""Locate the trigger of the 224px-path mixed-layout reduce fusions.

SPEED.md: the ResNet-50 @224 train step's large BN/elementwise reduce
fusions run ~2.3-2.6x off the HBM roofline, reading operands in mismatched
layouts ({3,0,2,1} vs {0,3,2,1}).  tools/probe_layout224.py showed a
homogeneous bottleneck stage does NOT reproduce this (reduces at roofline,
NHWC==NCHW), so the trigger must be the stem or the stage transitions.

Variants (all batch 128, bf16, fwd+bwd with a chained update):
    full        ResNet-50 @ 224 (the known-bad config)
    headless    ResNet-50 stages only, input fed at 56x56x64 (no stem)
    transition  stage3_block1 downsample unit alone (28^2x512 -> 14^2x1024)

For each: wall ms/step (dependency-chained — see probe_layout224.time_fn),
a device trace, and the optimized HLO dumped to <trace>/<variant>.hlo.txt
so the layout assignment of each fusion can be inspected directly.

Usage: python tools/probe_resnet50_layout.py [--variant all] [--trace /tmp/t50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all",
                    choices=["all", "full", "headless", "transition"])
    ap.add_argument("--trace", default="/tmp/t50")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import flax.linen as nn
    import jax.numpy as jnp

    from semantic_embeddings_tpu.models.resnet import (
        STAGE_BLOCKS,
        BottleneckBlock,
        ResNet,
    )
    from tools.probe_layout224 import time_fn

    class Headless(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for stage, n_blocks in enumerate(STAGE_BLOCKS[50]):
                features = 64 * (2 ** stage)
                for b in range(n_blocks):
                    x = BottleneckBlock(
                        features=features,
                        stride=2 if (b == 0 and stage > 0) else 1,
                        project=b == 0,
                        dtype=jnp.bfloat16,
                        name=f"stage{stage + 1}_block{b + 1}",
                    )(x, train)
            return jnp.mean(x, axis=(1, 2))

    class Transition(nn.Module):
        """The real stage2->stage3 boundary of ResNet-50 @224: one 28^2x512
        stage-2 block (features=128), the stride-2 projection block into
        14^2x1024 (features=256), one stage-3 block."""

        @nn.compact
        def __call__(self, x, train=False):
            x = BottleneckBlock(features=128, dtype=jnp.bfloat16,
                                name="pre")(x, train)
            x = BottleneckBlock(features=256, stride=2, project=True,
                                dtype=jnp.bfloat16, name="down")(x, train)
            x = BottleneckBlock(features=256, dtype=jnp.bfloat16,
                                name="post")(x, train)
            return x

    configs = {
        "full": (ResNet(depth=50, classes=100, dtype=jnp.bfloat16),
                 (BATCH, 224, 224, 3)),
        "headless": (Headless(), (BATCH, 56, 56, 64)),
        "transition": (Transition(), (BATCH, 28, 28, 512)),
    }

    variants = list(configs) if args.variant == "all" else [args.variant]
    key = jax.random.PRNGKey(0)

    for variant in variants:
        model, shape = configs[variant]
        x = jax.random.normal(key, shape, jnp.bfloat16)
        variables = jax.jit(
            lambda k, _m=model, _s=shape: _m.init(
                k, jnp.zeros((1,) + _s[1:], jnp.bfloat16), True)
        )(key)
        params = variables["params"]

        def loss_fn(params, x, _m=model, _v=variables):
            extra = {k: v for k, v in _v.items() if k != "params"}
            y, _ = _m.apply({"params": params, **extra}, x, True,
                            mutable=["batch_stats"])
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        step = jax.jit(jax.grad(loss_fn))

        lowered = step.lower(params, x)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        os.makedirs(args.trace, exist_ok=True)
        hlo_path = os.path.join(args.trace, f"{variant}.hlo.txt")
        try:
            with open(hlo_path, "w") as f:
                f.write(compiled.as_text())
        except Exception as e:  # remote backends may not expose HLO
            print(f"  (no HLO text: {e})", flush=True)

        dt = time_fn(step, params, x, jax)
        print(f"{variant:10s}  {dt * 1e3:8.3f} ms/step  (compile {compile_s:.0f}s)",
              flush=True)

        tdir = os.path.join(args.trace, variant)
        jax.profiler.start_trace(tdir)
        g = step(params, x)
        for _ in range(9):
            gl = jax.tree_util.tree_leaves(g)[0]
            x2 = x + (0 * gl.astype(x.dtype)).sum()  # chain dependency
            g = step(params, x2)
        jax.block_until_ready(g)
        jax.profiler.stop_trace()
        print(f"  trace -> {tdir}", flush=True)


if __name__ == "__main__":
    main()
