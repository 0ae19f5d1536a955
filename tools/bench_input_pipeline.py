#!/usr/bin/env python3
"""Composite disk → decode → prefetch → device @224 training rate.

VERDICT r4 #1: every @224 throughput number in SPEED.md measures the
device step over in-HBM synthetic batches; the claim that threaded decode
+ prefetch can sustain the device on a real multi-core host was
extrapolation.  This benchmark closes that link with measurements:

1. **composite img/s** — resnet-50 @224 bf16 cosine+CE training fed by the
   REAL ``data/files.py`` path (NAB-format on-disk JPEGs → native C++
   libjpeg thread-pool decode with DCT prescaling → prefetch queue →
   on-device normalize/flip/erase inside the jitted step), full epochs on
   the default device.
2. **decoder img/s per core** — the native decode+resize+crop core alone,
   1 thread and ``read_workers`` threads, over the same files (this host
   has 1 usable core; the per-core number is the scaling unit).
3. **core budget** — cores of this CPU needed to sustain the certified
   device-only rate: ``device_ips / decode_ips_per_core``.

The fixture is a generated NAB-format dataset (images.txt +
train_test_split.txt + image_class_labels.txt + JPEG files at NAB-like
photo resolution), cached under ``~/.cache/sed_composite_fixture``.
Usage: ``python tools/bench_input_pipeline.py [--full] [--no-device]``;
``bench.py`` calls :func:`measure` (quick mode) into its JSON ``extra``.

Reference recipe being modeled: ``/root/reference/learn_image_embeddings.py
:204,238-243`` (fit_generator with multiprocessing read workers) with the
NAB @224 config (``datasets/nab.py:7-103``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
if _repo_root not in sys.path:
    sys.path.append(_repo_root)

FIXTURE_ROOT = os.path.expanduser("~/.cache/sed_composite_fixture")
BATCH = 128
# NAB photos are ~1024x768; 800x600 keeps fixture build time sane on this
# 1-core host while staying in the same DCT-prescale regime (the decoder
# scales 800->250ish with libjpeg 1/4..1/2 DCT, same as 1024->256).
# Overridable (--src WxH) to quote the decode rate at other source sizes.
SRC_SIZE = (800, 600)
JPEG_QUALITY = 90


def make_fixture(n_train, n_test, n_classes=100, root=FIXTURE_ROOT):
    """Generates (or reuses) a NAB-format on-disk JPEG dataset."""
    tag = f"v1_{n_train}_{n_test}_{n_classes}_{SRC_SIZE[0]}x{SRC_SIZE[1]}"
    marker = os.path.join(root, f".complete_{tag}")
    ds_root = os.path.join(root, tag)
    if os.path.exists(marker):
        return ds_root
    from PIL import Image

    os.makedirs(os.path.join(ds_root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines_img, lines_split, lines_label = [], [], []
    for i in range(n_train + n_test):
        train = i < n_train
        cls = i % n_classes
        rel = f"images/c{cls:03d}_{i:06d}.jpg"
        # Low-frequency random content compresses like a natural photo
        # (pure noise JPEGs are unrealistically slow to decode).
        small = rng.integers(0, 256, (SRC_SIZE[1] // 8, SRC_SIZE[0] // 8, 3))
        img = Image.fromarray(small.astype(np.uint8)).resize(
            SRC_SIZE, Image.BILINEAR)
        img.save(os.path.join(ds_root, rel), quality=JPEG_QUALITY)
        img_id = str(i + 1)
        lines_img.append(f"{img_id} {rel[len('images/'):]}")
        lines_split.append(f"{img_id} {1 if train else 0}")
        lines_label.append(f"{img_id} {cls}")
    for name, lines in (("images.txt", lines_img),
                        ("train_test_split.txt", lines_split),
                        ("image_class_labels.txt", lines_label)):
        with open(os.path.join(ds_root, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(marker, "w") as f:
        f.write(tag + "\n")
    return ds_root


def _make_dataset(ds_root, read_workers=8):
    from semantic_embeddings_tpu.data.datasets import NABDataset

    # The NAB @224 recipe config: target 256 -> crop 224, random erasing
    # p=0.5 on device; mean/std passed explicitly (the tiny fixture's own
    # stats are irrelevant to throughput, and this skips a stats pass).
    return NABDataset(
        ds_root, cropsize=(224, 224), default_target_size=256,
        mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25],
        read_workers=read_workers,
    )


def measure_decode(ds, n_images=512, threads=(1, 8)):
    """Native decode+resize+crop core img/s at each thread count."""
    files = [ds.train_img_files[i % ds.num_train] for i in range(n_images)]
    rng = np.random.default_rng(1)
    out = {}
    saved = ds.read_workers
    try:
        for t in threads:
            ds.read_workers = t
            ds._compose(files[:BATCH], True, rng)  # warm (page cache, pool)
            t0 = time.perf_counter()
            for ofs in range(0, n_images, BATCH):
                ds._compose(files[ofs:ofs + BATCH], True, rng)
            out[t] = n_images / (time.perf_counter() - t0)
    finally:
        ds.read_workers = saved
    return out


def measure_composite(ds, epochs=3, device_warm_steps=3):
    """Full-epoch composite training rate (img/s) through the real file
    pipeline; returns (best_epoch_ips, per_epoch_ips, steps_per_epoch)."""
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    embedding = np.eye(ds.num_classes, dtype=np.float32)
    spec = build_network(ds.num_classes, "resnet-50", dtype=jnp.bfloat16)
    model = EmbeddingModel(backbone=spec.module, output="l2norm",
                           cls_classes=ds.num_classes, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 224, 224, 3)), train=False))(jax.random.PRNGKey(0))
    state = new_train_state(variables)
    # augment_train=True: the real recipe path (device-side color/flip/erase).
    prepare = ds.make_prepare(augment_train=True)
    step = make_train_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
        cls_weight=0.1, l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
        donate=True)
    rng = jax.random.PRNGKey(0)

    # Compile + device warm-up outside the timed epochs.
    warm = []
    for raw in ds.train_batches(BATCH, epoch=999):
        warm.append(raw)
        if len(warm) >= device_warm_steps:
            break
    for raw in warm:
        state, m = step(state, raw, 0.1, rng)
    jax.block_until_ready(m)

    per_epoch = []
    steps_per_epoch = int(np.ceil(ds.num_train / BATCH))
    for epoch in range(epochs):
        n_imgs = 0
        t0 = time.perf_counter()
        for raw in ds.train_batches(BATCH, epoch):
            state, m = step(state, raw, 0.1, rng)
            n_imgs += raw["image"].shape[0]
        jax.block_until_ready(m)
        per_epoch.append(n_imgs / (time.perf_counter() - t0))
    return max(per_epoch), per_epoch, steps_per_epoch


def measure(quick=True, device=True, device_ips_certified=2759.0):
    """Runs the composite benchmark; returns the JSON-able result dict.

    ``quick``: smaller fixture + fewer epochs (the bench.py extra).
    ``device_ips_certified``: the device-only rn50@224 rate (SPEED.md
    certificate) used for the core-budget arithmetic.
    """
    n_train, n_test = (1280, 128) if quick else (5120, 256)
    epochs = 2 if quick else 3
    ds_root = make_fixture(n_train, n_test)
    ds = _make_dataset(ds_root)
    decode = measure_decode(ds, n_images=256 if quick else 1024)
    result = {
        "fixture": {"n_train": n_train, "src_px": list(SRC_SIZE),
                    "jpeg_quality": JPEG_QUALITY, "crop": 224,
                    "target_size": 256, "batch": BATCH},
        "host_cores": os.cpu_count(),
        "decode_ips_1thread": round(decode.get(1, 0.0), 1),
        "decode_ips_8threads": round(decode.get(8, 0.0), 1),
        "device_ips_certified": device_ips_certified,
        "cores_to_sustain_device": round(
            device_ips_certified / max(decode.get(1, 1e-9), 1e-9), 1),
    }
    if device:
        composite, per_epoch, steps = measure_composite(ds, epochs=epochs)
        result.update(
            composite_ips=round(composite, 1),
            composite_ips_per_epoch=[round(x, 1) for x in per_epoch],
            steps_per_epoch=steps,
            host_bound=bool(composite < 0.9 * device_ips_certified),
        )
    return result


def main():
    global SRC_SIZE

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="larger fixture + more epochs")
    ap.add_argument("--no-device", action="store_true",
                    help="decode-path measurements only (no TPU step)")
    ap.add_argument("--src", default=None, metavar="WxH",
                    help="source JPEG size, e.g. 1024x768 (default 800x600)")
    args = ap.parse_args()
    if args.src:
        SRC_SIZE = tuple(int(v) for v in args.src.lower().split("x"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    result = measure(quick=not args.full, device=not args.no_device)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
