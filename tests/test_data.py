"""Data layer: permutations, CIFAR loading, on-device augmentation, file
datasets driven against synthetic on-disk images."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.data import (
    CifarDataset,
    NABDataset,
    SubDirectoryDataset,
    SyntheticDataset,
    get_data_generator,
)
from semantic_embeddings_tpu.data import augment
from semantic_embeddings_tpu.data.base import (
    batched_indices,
    batched_indices_masked,
    epoch_permutation,
)


def test_epoch_permutation_plain():
    rng = np.random.default_rng(0)
    labels = np.arange(10)
    perm = epoch_permutation(labels, rng, shuffle=True)
    assert sorted(perm) == list(range(10))


def test_epoch_permutation_oversample():
    rng = np.random.default_rng(0)
    labels = np.array([0] * 8 + [1] * 2 + [2] * 4)
    perm = epoch_permutation(labels, rng, oversample=True)
    counts = np.bincount(labels[perm])
    assert counts.tolist() == [8, 8, 8]  # every class sampled to max size


def test_epoch_permutation_repeats():
    rng = np.random.default_rng(0)
    perm = epoch_permutation(np.arange(5), rng, repeats=3)
    assert len(perm) == 15
    assert np.bincount(perm).tolist() == [3] * 5


def test_batched_indices_padding():
    batches = batched_indices(np.arange(10), 4)
    assert batches.shape == (3, 4)
    assert batches[2].tolist() == [8, 9, 0, 1]  # wraps

    idx, valid = batched_indices_masked(10, 4)
    assert idx.shape == (3, 4)
    assert valid[2].tolist() == [1.0, 1.0, 0.0, 0.0]


@pytest.fixture(scope="module")
def cifar_dir(tmp_path_factory):
    """Synthesizes a tiny CIFAR-100-format pickle pair."""
    root = tmp_path_factory.mktemp("cifar")
    rng = np.random.default_rng(0)

    def write(name, n):
        data = rng.integers(0, 256, (n, 3 * 32 * 32), dtype=np.int64).astype(
            np.uint8
        )
        labels = (np.arange(n) % 10).tolist()
        with open(root / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)

    write("train", 100)
    write("test", 40)
    return str(root)


def test_cifar_loading(cifar_dir):
    ds = CifarDataset(cifar_dir, classes=None)
    assert ds.num_train == 100
    assert ds.num_test == 40
    assert ds.num_classes == 10
    assert ds.mean.shape == (3,)
    # class subsetting + re-enumeration
    sub = CifarDataset(cifar_dir, classes=[3, 7], reenumerate=True)
    assert sub.num_classes == 2
    assert set(np.asarray(sub.labels_train)) == {0, 1}


def test_cifar_prepare_device(cifar_dir):
    ds = CifarDataset(cifar_dir)
    prepare = ds.make_prepare()
    raw = next(iter(ds.train_batches(16, epoch=0, seed=0)))
    images, labels = jax.jit(
        lambda r, k: prepare(r, k, True)
    )(raw, jax.random.PRNGKey(0))
    assert images.shape == (16, 32, 32, 3)
    assert labels.shape == (16,)
    # Normalized: roughly zero-mean unit-ish variance under the train stats.
    assert abs(float(jnp.mean(images))) < 0.5
    # Deterministic under the same key.
    images2, _ = jax.jit(lambda r, k: prepare(r, k, True))(
        raw, jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(images), np.asarray(images2))
    # Eval path applies no augmentation: exact normalization of test images.
    raw_t = next(iter(ds.test_batches(16)))
    imgs_t, _ = jax.jit(lambda r, k: prepare(r, k, False))(
        raw_t, jax.random.PRNGKey(0)
    )
    expected = (
        ds._x_test_host[raw_t["idx"]].astype(np.float32) - ds.mean
    ) / ds.std
    np.testing.assert_allclose(np.asarray(imgs_t), expected, rtol=1e-5)


def test_affine_identity():
    imgs = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out = augment.random_affine_batch(imgs, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_affine_flip_only():
    imgs = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    # With hflip forced on via probability-1 trick: use many samples.
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    flipped = 0
    for k in keys[:16]:
        out = augment.random_affine_batch(imgs, k, hflip=True)
        if np.allclose(np.asarray(out[0]), np.asarray(imgs[0, :, ::-1])):
            flipped += 1
    assert 2 <= flipped <= 14  # ~50% flip rate


def test_affine_zoom_changes_scale():
    # A centered bright square should grow/shrink under zoom but keep shape.
    img = np.zeros((1, 16, 16, 1), np.float32)
    img[0, 6:10, 6:10, 0] = 100.0
    imgs = jnp.asarray(img)
    areas = []
    for k in range(8):
        out = augment.random_affine_batch(
            imgs, jax.random.PRNGKey(k), zoom=0.25
        )
        assert out.shape == imgs.shape
        areas.append(float((np.asarray(out[0]) > 50).sum()))
    assert min(areas) < 16 <= max(areas)  # both shrunk and grown variants


def test_random_crop_and_center_crop():
    imgs = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    out = augment.random_crop_batch(imgs, jax.random.PRNGKey(1), 6, 6)
    assert out.shape == (2, 6, 6, 3)
    cc = augment.center_crop_batch(imgs, 6, 6)
    np.testing.assert_array_equal(np.asarray(cc), np.asarray(imgs[:, 2:8, 2:8]))


def test_random_erasing_masks_patch():
    imgs = jnp.zeros((8, 16, 16, 3))
    out = augment.random_erasing(
        imgs, jax.random.PRNGKey(0), mean=[0.0] * 3, std=[1.0] * 3,
        probability=1.0,
    )
    changed = np.asarray((out != 0).any(axis=(1, 2, 3)))
    assert changed.all()  # probability 1: every image has an erased patch
    frac = np.asarray((out != 0).mean(axis=(1, 2, 3)))
    assert (frac < 0.75).all()  # patches bounded well below the whole image

    out_none = augment.random_erasing(
        imgs, jax.random.PRNGKey(0), mean=[0.0] * 3, std=[1.0] * 3,
        probability=0.0,
    )
    assert not np.asarray(out_none).any()


@pytest.fixture(scope="module")
def nab_dir(tmp_path_factory):
    """Synthesizes a NAB/CUB-format dataset with real JPEG files."""
    from PIL import Image

    root = tmp_path_factory.mktemp("nab")
    os.makedirs(root / "images")
    rng = np.random.default_rng(0)
    lines_img, lines_split, lines_label = [], [], []
    for i in range(24):
        label = i % 4 + 1
        fn = f"img_{i:03d}.jpg"
        arr = rng.integers(0, 256, (40 + i, 50, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / fn)
        lines_img.append(f"{i} {fn}")
        lines_split.append(f"{i} {1 if i % 3 else 0}")
        lines_label.append(f"{i} {label}")
    (root / "images.txt").write_text("\n".join(lines_img))
    (root / "train_test_split.txt").write_text("\n".join(lines_split))
    (root / "image_class_labels.txt").write_text("\n".join(lines_label))
    return str(root)


def test_nab_dataset_end_to_end(nab_dir):
    ds = NABDataset(
        nab_dir, cropsize=(32, 32), default_target_size=36,
        mean=[120.0] * 3, std=[60.0] * 3, randerase_prob=0.5,
    )
    assert ds.num_classes == 4
    assert ds.num_train + ds.num_test == 24
    raw = next(iter(ds.train_batches(8, epoch=0, seed=0)))
    assert raw["image"].shape == (8, 32, 32, 3)
    assert raw["image"].dtype == np.uint8
    prepare = ds.make_prepare()
    imgs, labels = jax.jit(lambda r, k: prepare(r, k, True))(
        raw, jax.random.PRNGKey(0)
    )
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    # Test batches carry the validity mask.
    raws = list(ds.test_batches(5))
    assert all("valid" in r for r in raws)
    total_valid = sum(r["valid"].sum() for r in raws)
    assert total_valid == ds.num_test


def test_get_data_generator_suffixes(nab_dir):
    # cub-subX: split file name + train repeats (datasets/__init__.py:113-117)
    with pytest.raises(FileNotFoundError):
        get_data_generator("cub-sub10", nab_dir)  # split file doesn't exist
    ds = get_data_generator("synthetic-10")
    assert ds.num_classes == 10
    # synthetic-<classes>-<n_train>[-<n_test>]: recipe-scale epoch lengths
    ds = get_data_generator("synthetic-10-300-40")
    assert ds.num_classes == 10
    assert ds.num_train == 300 and ds.num_test == 40
    with pytest.raises(ValueError):
        get_data_generator("no-such-dataset", "/tmp")


def test_synthetic_dataset_shapes():
    ds = SyntheticDataset(num_classes=7, n_train=70, n_test=21)
    assert ds.num_classes == 7
    assert ds.steps_per_epoch(32) == 3
    raw = next(iter(ds.train_batches(32, 0, 0)))
    assert raw["idx"].shape == (32,)


def test_cropsize_none_uses_dataset_median(nab_dir):
    """cropsize=None resolves to the dataset-median TRANSFORMED size —
    the static-shape counterpart of the reference's per-batch median crop
    (datasets/common.py:409-413); deviation documented in PARITY.md."""
    # images are 50 x (40..63); no resize -> median width 50,
    # median height = median(40+i for train indices)
    ds = NABDataset(
        nab_dir, cropsize=None, default_target_size=-1,
        mean=[120.0] * 3, std=[60.0] * 3,
    )
    cw, ch = ds._resolved_cropsize()
    heights = [40 + i for i in range(24) if i % 3]  # train split
    assert cw == 50
    assert ch == int(np.median(heights))
    raw = next(iter(ds.train_batches(4, epoch=0, seed=0)))
    assert raw["image"].shape == (4, ch, cw, 3)

    # with a shorter-side target the median is of the RESIZED dims
    ds2 = NABDataset(
        nab_dir, cropsize=None, default_target_size=36,
        mean=[120.0] * 3, std=[60.0] * 3,
    )
    cw2, ch2 = ds2._resolved_cropsize()
    # aspect ratios are mixed (50 wide x 40..63 tall), so just check the
    # batch shape is static and equals the resolved median size
    raw2 = next(iter(ds2.train_batches(4, epoch=0, seed=0)))
    assert raw2["image"].shape == (4, ch2, cw2, 3)
