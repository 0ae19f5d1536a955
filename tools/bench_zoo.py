#!/usr/bin/env python3
"""Model-zoo train-step throughput on the real chip.

Measures steady-state images/sec of the FULL embedding train step (cosine
+ CE aux head, Keras-exact SGD) for every architecture family in the zoo,
at the reference's recipe resolution for each (``/root/reference/README.md``:
CIFAR recipes at 32 px batch 256; NASNet-A at 224 px).  Complements
bench.py's headline (resnet-110-wfc) and rn50 configs with the remaining
families so every family has a measured number (SPEED.md).

Usage: python tools/bench_zoo.py [arch ...]   (default: the full list)
       BENCH_BATCH=N overrides the batch size for every listed arch
       (batch sweeps; the default per-arch batches are the recipe ones).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # arch: (batch, image size, measure steps)
    "wrn-28-10": (256, 32, 20),
    "pyramidnet-272-200": (128, 32, 10),
    "pyramidnet-110-270": (256, 32, 10),
    "densenet-100-12": (256, 32, 20),
    "densenet-bc-190-40": (64, 32, 10),
    "resnet-32": (256, 32, 30),
    "simple": (256, 32, 30),
    "nasnet-a": (32, 224, 5),
}

#: non-fc CIFAR ResNets emit the global-pool features directly (64-d), so
#: the embedding targets must match that width (reference semantics:
#: utils.build_network 'resnet-32'/'resnet-110' have no projection layer).
EMBED_DIM = {"resnet-32": 64, "resnet-110": 64}


def bench_arch(jax, arch, batch, size, steps, windows=2):
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    d = EMBED_DIM.get(arch, 100)
    if d == 100:
        embedding = np.eye(100, dtype=np.float32)
    else:
        r = np.random.default_rng(0).normal(0, 1, (100, d)).astype(np.float32)
        embedding = r / np.linalg.norm(r, axis=1, keepdims=True)
    dataset = SyntheticDataset(num_classes=100, n_train=batch * 2,
                               n_test=batch, size=size)
    spec = build_network(d, arch, dtype=jnp.bfloat16)
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

    def run_window(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, raws[i % len(raws)], 0.1, rng)
        jax.block_until_ready(m)
        return time.perf_counter() - t0

    # two-window regression (bench._measure_per_step): cancels the
    # per-window host-sync RTT that under-reported short windows by up to
    # ~7% (SPEED.md round 4)
    import bench

    ips, band = bench._measure_per_step(run_window, batch, steps, 3 * steps,
                                        pairs=max(2, windows))
    return ips, 1e3 * batch / ips


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    archs = sys.argv[1:] or list(CONFIGS)
    batch_override = os.environ.get("BENCH_BATCH")
    results = {}
    for arch in archs:
        batch, size, steps = CONFIGS[arch]
        if batch_override:
            batch = int(batch_override)
        t0 = time.time()
        try:
            ips, ms = bench_arch(jax, arch, batch, size, steps)
            results[arch] = {
                "img_per_sec": round(ips, 1),
                "ms_per_step": round(ms, 2),
                "batch": batch, "size": size,
                "compile_s": round(time.time() - t0 - 0.0, 1),
            }
            print(f"{arch}: {ips:,.0f} img/s  ({ms:.1f} ms @ batch {batch}, "
                  f"{size}px)", flush=True)
        except Exception as e:
            results[arch] = {"error": repr(e)[:300]}
            print(f"{arch}: ERROR {e!r}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
