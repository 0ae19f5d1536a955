#!/usr/bin/env python3
"""Throughput benchmark: CIFAR-100 cosine-loss training on ResNet-110-wfc.

Measures steady-state images/sec/chip of the FULL training step (on-device
augmentation + forward + cosine/CE losses + backward + Keras-exact SGD
update) on the default device, mirroring BASELINE.json's headline config
("CIFAR-100 + ResNet-110 cosine loss").

The reference publishes no throughput numbers (SURVEY.md §6), so the
comparison divisor is a DERIVED PHYSICAL CEILING, not an estimate — every
assumption favors the baseline (full derivation in BASELINE.md "GPU
baseline ceiling"):

- Work per image: 5.696 GFLOP fwd+bwd for this exact resnet-110-wfc f32
  train step, measured with XLA's own cost analysis
  (``jit(step).lower(...).compile().cost_analysis()['flops'] / batch``).
- Hardware ceiling: a GTX 1080 Ti (the 2019 academic-lab GPU class;
  the reference specifies none) peaks at 11.3 TF/s fp32, giving an
  absolute ceiling of 11.3e12 / 5.696e9 = 1,984 img/s at a physically
  impossible 100% end-to-end utilization.  Even against a perfect
  V100 (15.7 TF/s fp32 -> 2,756 img/s ceiling), the measured TPU
  number exceeds 5x unless the Keras pipeline sustained >99% of peak
  on 32x32 convs with host-side PIL augmentation — it cannot.

``vs_baseline`` = ours / that 1080 Ti ceiling: a LOWER BOUND on the true
speedup over any real Keras/TF-1.x run of the reference.  The north star
in BASELINE.json asks for >= 5x.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

# GTX 1080 Ti fp32 peak (11.3 TF/s) / measured 5.696 GFLOP per image
# fwd+bwd = the reference pipeline's physical throughput ceiling on its
# hardware class (see module docstring + BASELINE.md for the derivation).
KERAS_GPU_BASELINE_IPS = 11.3e12 / 5.696e9  # = 1,984 img/s ceiling

BATCH = 256
WARMUP_STEPS = 10
# Median of N pairs, with the min-max band reported alongside: run-to-run
# spread on this setup comes from outside the device (remote tunnel hiccups,
# host scheduling), and a single best-of point let the certificate and the
# driver artifact drift apart silently (round-2 verdict: 2,602 vs 2,722
# rn50 readings).  The median is the honest steady-state number; the band
# makes the spread visible in the JSON itself.
MEASURE_PAIRS = 5


def _measure_per_step(run_window, batch, s1, s2, pairs=MEASURE_PAIRS):
    """Two-window regression: per-step time = (T(s2) − T(s1)) / (s2 − s1).

    Every timed window ends in ONE ``block_until_ready`` host sync, which
    on this remote-tunnel backend costs a full RTT (~34 ms MEASURED in the
    round-4 reconciliation probe — 7% of a 10-step rn50 window, the whole
    r2/r3 bench-vs-certificate contradiction).  Timing two window lengths
    back-to-back and differencing cancels that per-window constant
    exactly, leaving pure per-step device throughput — the number a
    colocated-host deployment sees.  Returns ``(median_ips, band)`` over
    ``pairs`` independent (s1, s2) pairs; ``band`` also carries the raw
    (overhead-inclusive) s2-window ips and the implied per-window
    overhead so the correction is visible in the artifact.
    """
    derived, raw2, ovh = [], [], []
    for _ in range(pairs):
        t1 = run_window(s1)
        t2 = run_window(s2)
        t_step = (t2 - t1) / (s2 - s1)
        derived.append(batch / t_step)
        raw2.append(batch * s2 / t2)
        ovh.append(t1 - s1 * t_step)
    derived.sort()
    median = derived[len(derived) // 2]
    return median, {
        "pairs": pairs,
        "window_steps": [s1, s2],
        "ips_min": round(derived[0], 1),
        "ips_max": round(derived[-1], 1),
        "spread_pct": round(100.0 * (derived[-1] - derived[0]) / median, 2),
        "raw_ips_long_window": round(sorted(raw2)[len(raw2) // 2], 1),
        "window_sync_overhead_ms": round(
            1e3 * sorted(ovh)[len(ovh) // 2], 1),
    }


def bench_headline(jax, dtype=None, s1=20, s2=100, pairs=MEASURE_PAIRS):
    """resnet-110-wfc @32 headline train-step throughput at ``dtype``
    (None = f32).  Window lengths (20, 100): at ~18 ms/step the differenced
    span is 80 steps ≈ 1.4 s, so millisecond-scale tunnel jitter moves the
    derived rate by <0.5% — the r4 (10, 50) windows differenced only
    0.72 s and carried a 13.5% band (VERDICT r4 weak #1)."""
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state
    from semantic_embeddings_tpu.embeddings import unitsphere_embedding
    from semantic_embeddings_tpu.hierarchy import (
        ClassHierarchy,
        semantic_distance_matrix,
    )

    # Real semantic embedding targets from the CIFAR taxonomy when available.
    try:
        h = ClassHierarchy.from_file(
            "/root/reference/Cifar-Hierarchy/cifar.parent-child.txt", id_type=int
        )
        leaves = sorted(h.leaves())
        embedding = unitsphere_embedding(
            1.0 - semantic_distance_matrix(h, leaves)
        ).astype(np.float32)
    except Exception as e:
        # Throughput is target-independent, but say so loudly: one-hot
        # targets are NOT the headline CIFAR-taxonomy config.
        import sys

        print(f"WARNING: CIFAR taxonomy unavailable ({e}); benchmarking "
              "against one-hot targets.", file=sys.stderr)
        embedding = np.eye(100, dtype=np.float32)

    import os

    fused = os.environ.get("BENCH_FUSED_LOSS") == "1"
    dataset = SyntheticDataset(num_classes=100, n_train=BATCH * 8, n_test=BATCH)
    spec = build_network(embedding.shape[1], "resnet-110-wfc", dtype=dtype)
    # With the fused Pallas cosine kernel the model emits raw embeddings and
    # the kernel owns normalization; otherwise the l2norm output head is used
    # and XLA fuses normalize+dot into the graph.
    model = EmbeddingModel(
        backbone=spec.module,
        output="linear" if fused else "l2norm",
        cls_classes=100,
        dtype=dtype,
    )

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 3)), train=False)
    )(jax.random.PRNGKey(0))
    state = new_train_state(variables)

    # The Pallas fused cosine kernel is numerically identical but costs a
    # few extra minutes of Mosaic compile on this remote-compile setup with
    # no measurable steady-state win at this embedding width (XLA already
    # fuses normalize+dot into the surrounding graph); opt in via env var.
    overrides = {}
    if fused:
        from semantic_embeddings_tpu.ops import fused_cosine_loss

        overrides["loss_fn_override"] = lambda tgt, z: fused_cosine_loss(z, tgt)

    prepare = dataset.make_prepare()
    train_step = make_train_step(
        model, prepare,
        loss_name="inv_corr",
        class_embedding=embedding,
        cls_weight=0.1,
        l2_penalty_fn=spec.l2_penalty,
        clipnorm=10.0,
        donate=True,
        **overrides,
    )

    batches = list(dataset.train_batches(BATCH, 0, 0))
    rng = jax.random.PRNGKey(0)

    for i in range(WARMUP_STEPS):
        state, metrics = train_step(state, batches[i % len(batches)], 0.1, rng)
    jax.block_until_ready(metrics)

    def run_window(steps):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = train_step(
                state, batches[i % len(batches)], 0.1, rng
            )
        jax.block_until_ready(metrics)
        return time.perf_counter() - t0

    return _measure_per_step(run_window, BATCH, s1, s2, pairs)


def main():
    import os

    import jax

    # Persistent compile cache: the first bench run pays the (remote) XLA
    # compile once; every later run starts hot.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    # bfloat16 compute with float32 params/stats — the TPU-native precision
    # (swap the headline to f32 with BENCH_F32=1; the other precision is
    # captured in extra either way, VERDICT r4 #7).  Batch 256 is the
    # measured sweet spot on v5e for this 32x32 workload.
    f32_headline = os.environ.get("BENCH_F32") == "1"
    ips, band = bench_headline(
        jax, dtype=None if f32_headline else jnp.bfloat16)

    out = {
        "metric": "train_images_per_sec_per_chip_resnet110wfc_cifar100_cosine",
        "value": round(ips, 1),
        "unit": ("images/sec/chip (per-step rate, median of %d two-window "
                 "regressions)" % MEASURE_PAIRS),
        "vs_baseline": round(ips / KERAS_GPU_BASELINE_IPS, 3),
        "headline_dtype": "f32" if f32_headline else "bf16",
        "band": band,
    }
    extra = {}
    if os.environ.get("BENCH_HEADLINE_BOTH", "1") != "0":
        # The other precision, same protocol (VERDICT r4 #7): the reference
        # trains f32, the headline defaults to bf16 — the artifact carries
        # both so the precision mix behind vs_baseline is explicit.
        try:
            o_ips, o_band = bench_headline(
                jax, dtype=jnp.bfloat16 if f32_headline else None)
            key = "headline_bf16" if f32_headline else "headline_f32"
            extra.update({key + "_ips": round(o_ips, 1),
                          key + "_band": o_band})
        except Exception as e:
            extra["headline_other_dtype_error"] = repr(e)[:200]
    if os.environ.get("BENCH_RN50", "1") != "0":
        try:
            rn50_ips, rn50_band = bench_rn50(jax)
            extra.update(rn50_224_ips=round(rn50_ips, 1),
                         rn50_224_band=rn50_band)
        except Exception as e:  # never let the extra config kill the headline
            extra["rn50_224_error"] = repr(e)[:200]
    if os.environ.get("BENCH_RETRIEVAL", "1") != "0":
        # Regression-track retrieval throughput (VERDICT r3 #6): the 10k
        # full protocol (P@k + AHP@250 + AP, full-sort ranking) and the
        # 50k ILSVRC-style mAHP@250 protocol (exact chunked top-k path).
        # Each row carries a {min,max,spread_pct} band over independent
        # timed runs (VERDICT r4 #5).
        try:
            import bench_retrieval

            qps10, _, band10 = bench_retrieval.measure_protocol(
                n=10_000, full_ap=True, runs=5)
            qps50, _, band50 = bench_retrieval.measure_protocol(
                n=50_000, full_ap=False, block_size=None, runs=5)
            extra.update(retrieval_qps_10k_full=round(qps10, 1),
                         retrieval_qps_10k_full_band=band10,
                         retrieval_qps_50k_top250=round(qps50, 1),
                         retrieval_qps_50k_top250_band=band50)
        except Exception as e:
            extra["retrieval_error"] = repr(e)[:200]
    if os.environ.get("BENCH_COMPOSITE", "1") != "0":
        # Composite disk→decode→prefetch→device @224 training rate through
        # the real file pipeline (VERDICT r4 #1) — quantifies the host
        # input-path link the synthetic-batch rows bypass.
        try:
            from tools import bench_input_pipeline

            extra["composite_rn50_224"] = bench_input_pipeline.measure(
                quick=True)
        except Exception as e:
            extra["composite_error"] = repr(e)[:200]
    if extra:
        out["extra"] = extra
    print(json.dumps(out))


def bench_rn50(jax, batch=128, size=224, s1=10, s2=40, pairs=MEASURE_PAIRS):
    """ResNet-50 @224 bf16 train-step throughput (img/s) — the VERDICT r1
    secondary config (the reference's CUB/NAB/ILSVRC recipes,
    ``/root/reference/README.md:267,283,304``). Disable with BENCH_RN50=0.
    Returns ``(median_ips, band)`` via the same two-window regression as
    the headline (the r2/r3 2,602-vs-2,758 contradiction was exactly the
    per-window host-sync RTT over 10-step windows; see SPEED.md r4)."""
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    embedding = np.eye(100, dtype=np.float32)
    dataset = SyntheticDataset(num_classes=100, n_train=batch * 4,
                               n_test=batch, size=size)
    spec = build_network(100, "resnet-50", dtype=jnp.bfloat16)
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
    for i in range(5):
        state, m = step(state, raws[i % len(raws)], 0.1, rng)
    jax.block_until_ready(m)

    def run_window(steps):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, raws[i % len(raws)], 0.1, rng)
        jax.block_until_ready(m)
        return time.perf_counter() - t0

    return _measure_per_step(run_window, batch, s1, s2, pairs)


if __name__ == "__main__":
    main()
