"""Executed augmentation oracle for the TINY (in-memory CIFAR) path.

``tests/test_augment_oracle.py`` covers the file-dataset pipeline
(``FileDatasetGenerator``); this module does the same for the reference's
``TinyDatasetGenerator`` (``/root/reference/datasets/common.py:635-844``) —
the path every CIFAR headline recipe rides on.  The reference wraps Keras's
``ImageDataGenerator`` (featurewise center/std from the train set,
horizontal flips, continuous ±0.15 width/height shifts applied by a
bilinear affine with edge-clamp fill); ours is the on-device
``InMemoryDataset`` + ``augment.random_affine_batch``.

Checks, against the reference's OWN instance (imported as an oracle only):

- featurewise mean/std fit parity (exact) and eval-path pixel parity,
- fixed-parameter transform parity: the same (tx, ty, flip) produces the
  same pixels through Keras's scipy affine and our gather kernel
  (bilinear + edge clamp, ~1e-4) — this pins sign/axis conventions that
  distribution tests cannot see,
- shift-offset distributions recovered from a spike image's center of
  mass (two-sample KS, continuous law U(-0.15, 0.15)·size),
- horizontal-flip rate and action.

One DOCUMENTED deviation is asserted, not hidden: Keras shifts then flips
(so a flipped sample's x-shift appears mirrored), ours flips the sampling
grid (x-shift in pre-flip coordinates).  The x-shift law is symmetric and
independent of the flip, so the joint distribution is identical; the
fixed-parameter test therefore negates tx for flipped samples.
"""

import os
import sys

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")
scipy_stats = pytest.importorskip("scipy.stats")

import jax  # noqa: E402

from test_keras_import_oracle import _install_keras2_shims  # noqa: E402

REFERENCE_DIR = "/root/reference"

KS_P = 1e-3
N = 500


@pytest.fixture(scope="module")
def oracle(rng):
    """(reference TinyDatasetGenerator, our InMemoryDataset, raw arrays)."""
    _install_keras2_shims()
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    # force-front: mid-session path churn must not shadow the reference
    if REFERENCE_DIR in sys.path:
        sys.path.remove(REFERENCE_DIR)
    sys.path.insert(0, REFERENCE_DIR)
    from datasets.common import TinyDatasetGenerator  # reference's own

    from semantic_embeddings_tpu.data.cifar import InMemoryDataset

    x_train = rng.integers(0, 256, (64, 32, 32, 3)).astype(np.float32)
    x_test = rng.integers(0, 256, (16, 32, 32, 3)).astype(np.float32)
    y_train = list(rng.integers(0, 4, 64))
    y_test = list(rng.integers(0, 4, 16))

    ref = TinyDatasetGenerator(x_train, x_test, y_train, y_test)
    ours = InMemoryDataset(
        x_train.astype(np.uint8), y_train, x_test.astype(np.uint8), y_test
    )
    return ref, ours, (x_train, x_test)


def test_featurewise_fit_parity(oracle):
    """Keras ``ImageDataGenerator.fit`` computes per-channel mean/std over
    the whole train set; ours must match (Keras adds 1e-6 to std at
    standardize time — covered by the eval-path test's tolerance)."""
    ref, ours, _ = oracle
    np.testing.assert_allclose(
        np.ravel(ref.image_generator.mean), ours.mean, rtol=1e-5)
    np.testing.assert_allclose(
        np.ravel(ref.image_generator.std), ours.std, rtol=1e-5)


def test_eval_path_pixel_parity(oracle):
    """compose_batch(train=False, augment=False) == our eval prepare()."""
    ref, ours, (_, x_test) = oracle
    idx = np.arange(len(x_test))
    ref_batch = ref.compose_batch(idx, train=False, augment=False)
    prepare = ours.make_prepare()
    imgs, _ = prepare({"idx": idx.astype(np.int32)}, jax.random.key(0),
                      train=False)
    np.testing.assert_allclose(np.asarray(imgs), ref_batch, atol=2e-4)


def _our_affine(img, ty, tx, flip):
    from semantic_embeddings_tpu.data import augment

    return np.asarray(
        augment._affine_sample(
            img.astype(np.float32), np.float32(ty), np.float32(tx),
            np.float32(1.0), np.float32(1.0), np.bool_(flip),
        )
    )


def test_fixed_transform_pixel_parity(oracle):
    """Keras ``apply_transform`` and our gather kernel agree pixel-for-pixel
    for explicit (tx, ty, flip) parameters — bilinear interpolation AND the
    edge-clamp ('nearest') fill at the borders.

    tf_keras convention (measured, and asserted here): ``tx`` displaces
    COLUMNS by ``-tx`` and ``ty`` displaces ROWS by ``-ty`` (despite
    ``get_random_transform`` drawing ``tx`` from *height*_shift_range —
    a long-standing Keras naming quirk that is invisible for square
    images); ours is ``output[y, x] = input[y - ty_ours, x - tx_ours]``,
    i.e. displacement ``(+ty_ours, +tx_ours)``, with the flip applied to
    the sampling grid (see module docstring for the flip-composition
    deviation)."""
    ref, _, (x_train, _) = oracle
    img = x_train[0]
    rng = np.random.default_rng(7)
    for _ in range(12):
        txk = float(rng.uniform(-4.8, 4.8))   # keras col displacement: -txk
        tyk = float(rng.uniform(-4.8, 4.8))   # keras row displacement: -tyk
        flip = bool(rng.integers(0, 2))
        ref_out = ref.image_generator.apply_transform(
            img.copy(),
            {"tx": txk, "ty": tyk, "flip_horizontal": flip},
        )
        # keras flips AFTER shifting; we flip the sampling grid, so the
        # equivalent x-shift is mirrored for flipped samples
        ours_out = _our_affine(
            img, ty=-tyk, tx=(txk if flip else -txk), flip=flip)
        np.testing.assert_allclose(ours_out, ref_out, atol=1e-3)


def _spike_com(batch, spike_pos=15):
    """Continuous (dy, dx) of a bilinearly-interpolated spike relative to
    its ORIGINAL position, via center of mass (exact for pure shifts)."""
    b, h, w, _ = batch.shape
    mass = batch[..., 0]
    total = mass.sum(axis=(1, 2))
    ys = (mass.sum(axis=2) * np.arange(h)).sum(axis=1) / total
    xs = (mass.sum(axis=1) * np.arange(w)).sum(axis=1) / total
    return ys - spike_pos, xs - spike_pos


def test_shift_distribution(oracle):
    """The recovered continuous shift offsets follow the same
    U(-0.15, 0.15)·32 law on both sides (flips disabled to isolate)."""
    _install_keras2_shims()
    from datasets.common import TinyDatasetGenerator

    from semantic_embeddings_tpu.data import augment

    spike = np.zeros((32, 32, 3), np.float32)
    spike[15, 15] = 255.0  # interior spike; max |shift| = 4.8 px stays off
    # the borders, so no clamping distorts the center of mass

    ref = TinyDatasetGenerator(
        spike[None].repeat(2, 0), spike[None], [0, 1], [0],
        generator_kwargs={},
        train_generator_kwargs={"width_shift_range": 0.15,
                                "height_shift_range": 0.15},
    )
    ref_out = np.stack([
        ref.image_generator.random_transform(spike.copy()) for _ in range(N)
    ])
    ref_dy, ref_dx = _spike_com(ref_out)

    ours_out = np.asarray(augment.random_affine_batch(
        np.broadcast_to(spike, (N, 32, 32, 3)).astype(np.float32),
        jax.random.key(3), width_shift=0.15, height_shift=0.15, hflip=False,
    ))
    our_dy, our_dx = _spike_com(ours_out)

    for a, b, what in [(ref_dy, our_dy, "dy"), (ref_dx, our_dx, "dx")]:
        stat = scipy_stats.ks_2samp(a, b)
        assert stat.pvalue > KS_P, (
            f"{what}: KS={stat.statistic:.4f} p={stat.pvalue:.2e} "
            f"(ref range [{a.min():.2f},{a.max():.2f}] vs ours "
            f"[{b.min():.2f},{b.max():.2f}])")
        assert abs(a).max() <= 4.81 and abs(b).max() <= 4.81


def test_flip_rate_and_action(oracle):
    """50% horizontal flips, and a flip is an exact column mirror."""
    _install_keras2_shims()
    from datasets.common import TinyDatasetGenerator

    from semantic_embeddings_tpu.data import augment

    marker = np.zeros((32, 32, 3), np.float32)
    marker[:, :16] = 255.0  # left-half bright

    ref = TinyDatasetGenerator(
        marker[None].repeat(2, 0), marker[None], [0, 1], [0],
        generator_kwargs={},
        train_generator_kwargs={"horizontal_flip": True},
    )
    ref_flipped = np.array([
        ref.image_generator.random_transform(marker.copy())[0, -1, 0] > 128
        for _ in range(N)
    ])
    ours_out = np.asarray(augment.random_affine_batch(
        np.broadcast_to(marker, (N, 32, 32, 3)).astype(np.float32),
        jax.random.key(5), hflip=True,
    ))
    ours_flipped = ours_out[:, 0, -1, 0] > 128

    for flips, side in [(ref_flipped, "ref"), (ours_flipped, "ours")]:
        rate = flips.mean()
        assert 0.5 - 4 * 0.5 / np.sqrt(N) < rate < 0.5 + 4 * 0.5 / np.sqrt(N), (
            side, rate)
    # action equality: flipped output == exact mirror (no resampling blur)
    flipped_idx = int(np.argmax(ours_flipped))
    np.testing.assert_allclose(
        ours_out[flipped_idx], marker[:, ::-1], atol=1e-4)
