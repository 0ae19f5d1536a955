#!/usr/bin/env python3
"""Trace a model-zoo train step on the real chip and print the roofline table.

    python tools/probe_zoo_trace.py densenet-100-12 [--batch 256] [--size 32]
        [--steps 12] [--trace_dir /tmp/trace_zoo]

Reuses bench_zoo's step construction so the traced program is exactly the
zoo-bench config (full embedding train step, bf16, Keras-exact SGD), then
summarizes the device trace with analyze_trace (per-op + roofline views).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("arch")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--trace_dir", default=None)
    args = p.parse_args()

    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state
    from tools.bench_zoo import CONFIGS, EMBED_DIM

    batch, size, _ = CONFIGS.get(args.arch, (256, 32, 10))
    batch = args.batch or batch
    size = args.size or size
    trace_dir = args.trace_dir or f"/tmp/trace_zoo_{args.arch.replace('-', '_')}"

    d = EMBED_DIM.get(args.arch, 100)
    if d == 100:
        embedding = np.eye(100, dtype=np.float32)
    else:
        r = np.random.default_rng(0).normal(0, 1, (100, d)).astype(np.float32)
        embedding = r / np.linalg.norm(r, axis=1, keepdims=True)
    dataset = SyntheticDataset(num_classes=100, n_train=batch * 2,
                               n_test=batch, size=size)
    spec = build_network(d, args.arch, dtype=jnp.bfloat16)
    model = EmbeddingModel(backbone=spec.module, output="l2norm",
                           cls_classes=100, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, size, size, 3)), train=False))(jax.random.PRNGKey(0))
    state = new_train_state(variables)
    prepare = dataset.make_prepare(augment_train=False)
    step = make_train_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
        cls_weight=0.1, l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
        donate=True)
    raws = list(dataset.train_batches(batch, 0, 0))
    rng = jax.random.PRNGKey(0)
    for i in range(3):
        state, m = step(state, raws[i % len(raws)], 0.1, rng)
    jax.block_until_ready(m)

    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, m = step(state, raws[i % len(raws)], 0.1, rng)
        jax.block_until_ready(m)
    print(f"trace written to {trace_dir}", flush=True)

    from tools import analyze_trace
    xs = analyze_trace.load_xspace(analyze_trace.find_xplane(trace_dir))
    analyze_trace.summarize(xs, top=18, by="op")
    analyze_trace.roofline(xs, top=18)


if __name__ == "__main__":
    main()
