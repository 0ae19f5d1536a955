#!/usr/bin/env python3
"""ResNet-50 @ 224 px probe: batch/remat sweep, per-op trace, roofline table.

Round-2 instrumentation for the ImageNet-resolution path (VERDICT #1): put
the 224 px step under the same microscope as SPEED.md's 32 px analysis.

    python tools/probe_rn50_224.py --batches 128,192,256 [--remat both]
        [--trace_batch 128 --trace_dir /tmp/trace_rn50] [--augment]
        [--size 224] [--steps 20]

Prints measured img/s per config plus the shape-derived roofline table
(per-stage MXU lane-bound FLOP time and HBM activation-traffic time for
fwd+bwd), so measured numbers can be compared against physical bounds.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197e12
V5E_HBM_BPS = 819e9


def rn50_roofline(batch, hw, bf16=True):
    """Analytic per-stage conv FLOPs + activation bytes for ResNet-50 v1.

    Returns a list of (stage, flops_fwd, act_bytes_fwd) per image.  bwd
    multipliers applied by the caller: FLOPs x3 (fwd + dX + dW), bytes x~2.5
    (bwd re-reads activations and writes gradients; BN stats re-read).
    """
    act = 2 if bf16 else 4
    out = []
    # stem: 7x7/2 conv 3->64 @ hw/2, maxpool -> hw/4
    h = hw // 2
    flops = 2 * h * h * 49 * 3 * 64
    bytes_ = (hw * hw * 3 + h * h * 64) * act
    out.append(("stem", flops, bytes_))
    cfg = [(3, 64, hw // 4), (4, 128, hw // 8), (6, 256, hw // 16),
           (8 // 2 - 1, 512, hw // 32)]  # [3,4,6,3]
    cfg[3] = (3, 512, hw // 32)
    for i, (blocks, f, h) in enumerate(cfg):
        flops = 0
        bytes_ = 0
        cin = 64 * 4 * (2 ** (i - 1)) if i else 64  # input to first block
        for b in range(blocks):
            c_in = cin if b == 0 else 4 * f
            # 1x1 reduce, 3x3, 1x1 expand (+1x1 shortcut in block 0)
            flops += 2 * h * h * (c_in * f + 9 * f * f + f * 4 * f)
            if b == 0:
                flops += 2 * h * h * c_in * 4 * f
            # activations written: 3 conv outputs + block output add
            bytes_ += h * h * (f + f + 4 * f + 4 * f) * act
        out.append((f"stage{i + 1}", flops, bytes_))
    return out


def print_roofline(batch, hw):
    rows = rn50_roofline(batch, hw)
    tot_f = tot_b = 0.0
    print(f"-- roofline (batch {batch}, {hw}px, bf16; bwd: FLOPs x3, "
          f"bytes x2.5) --")
    print(f"{'stage':8s} {'GFLOP/img':>10s} {'MB/img':>8s} "
          f"{'MXU ms/step':>12s} {'HBM ms/step':>12s}")
    for name, flops, bytes_ in rows:
        f3 = 3 * flops
        b25 = 2.5 * bytes_
        t_mxu = batch * f3 / V5E_BF16_TFLOPS * 1e3
        t_hbm = batch * b25 / V5E_HBM_BPS * 1e3
        tot_f += t_mxu
        tot_b += t_hbm
        print(f"{name:8s} {f3 / 1e9:10.2f} {b25 / 1e6:8.1f} "
              f"{t_mxu:12.2f} {t_hbm:12.2f}")
    serial = tot_f + tot_b
    overlap = max(tot_f, tot_b)
    print(f"{'TOTAL':8s} {'':10s} {'':8s} {tot_f:12.2f} {tot_b:12.2f}")
    print(f"serial roofline {serial:.1f} ms/step = "
          f"{batch / serial * 1e3:,.0f} img/s; "
          f"perfect-overlap roofline {overlap:.1f} ms = "
          f"{batch / overlap * 1e3:,.0f} img/s")
    return serial, overlap


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="128")
    p.add_argument("--remat", type=str, default="off",
                   choices=["off", "on", "both"])
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--trace_batch", type=int, default=0)
    p.add_argument("--trace_dir", type=str, default="/tmp/trace_rn50")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--dot1x1", action="store_true",
                   help="express 1x1 convs as flattened GEMMs")
    p.add_argument("--no_s2d", action="store_true",
                   help="disable the space-to-depth stem")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    batches = [int(b) for b in args.batches.split(",")]
    remats = {"off": [False], "on": [True], "both": [False, True]}[args.remat]
    dtype = None if args.f32 else jnp.bfloat16
    embedding = np.eye(100, dtype=np.float32)

    for b in batches:
        print_roofline(b, args.size)
    results = {}
    for remat in remats:
        for batch in batches:
            dataset = SyntheticDataset(
                num_classes=100, n_train=batch * 4, n_test=batch,
                size=args.size)
            spec = build_network(100, "resnet-50", dtype=dtype, remat=remat)
            backbone = spec.module
            if args.dot1x1 or args.no_s2d:
                import dataclasses

                backbone = dataclasses.replace(
                    backbone, conv1x1_as_dot=args.dot1x1,
                    stem_s2d=not args.no_s2d)
            model = EmbeddingModel(
                backbone=backbone, output="l2norm", cls_classes=100,
                dtype=dtype)
            variables = jax.jit(lambda k: model.init(
                k, jnp.zeros((1, args.size, args.size, 3)), train=False)
            )(jax.random.PRNGKey(0))
            state = new_train_state(variables)
            prepare = dataset.make_prepare(augment_train=args.augment)
            step = make_train_step(
                model, prepare, loss_name="inv_corr",
                class_embedding=embedding, cls_weight=0.1,
                l2_penalty_fn=spec.l2_penalty, clipnorm=10.0, donate=True)
            raws = list(dataset.train_batches(batch, 0, 0))
            rng = jax.random.PRNGKey(0)
            t_compile = time.time()
            for i in range(5):
                state, m = step(state, raws[i % len(raws)], 0.1, rng)
            jax.block_until_ready(m)
            print(f"[batch {batch} remat {remat}] warmup+compile "
                  f"{time.time() - t_compile:.0f}s", flush=True)
            tracing = (batch == args.trace_batch and remat is remats[0])
            if tracing:
                jax.profiler.start_trace(args.trace_dir)
            best = np.inf
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for i in range(args.steps):
                    state, m = step(state, raws[i % len(raws)], 0.1, rng)
                jax.block_until_ready(m)
                best = min(best, time.perf_counter() - t0)
                if tracing:
                    break  # one traced window is enough
            if tracing:
                jax.profiler.stop_trace()
                print(f"trace written to {args.trace_dir}")
            ips = batch * args.steps / best
            ms = best / args.steps * 1e3
            results[(batch, remat)] = (ips, ms)
            print(f"[batch {batch} remat {remat}] {ms:.1f} ms/step = "
                  f"{ips:,.0f} img/s", flush=True)
            del state, step, raws, variables
    print("\n== summary ==")
    for (batch, remat), (ips, ms) in sorted(results.items()):
        print(f"batch {batch:4d} remat {str(remat):5s}: {ms:7.1f} ms  "
              f"{ips:9,.0f} img/s")


if __name__ == "__main__":
    main()
