"""Executed augmentation-distribution oracle vs the reference's own code.

PARITY.md's augmentation link was previously checked only at the formula
level (RGB<->HSV vs matplotlib, parameter ranges).  This module RUNS the
reference's own augmentation implementation
(``/root/reference/datasets/common.py:380-581,848-946`` via a real
``NABGenerator`` instance) on fixed synthetic images and statistically
compares each stochastic transform against the jnp/on-device pipeline:

- random-crop and reflect-pad OFFSET distributions (exact recovery from
  coordinate-encoded PNGs; two-sample KS),
- horizontal-flip rate (binomial) and flip ACTION equality,
- random-erasing AREA and ASPECT distributions (box recovery from the
  normalized diff; two-sample KS — sharp enough to catch the clamp-vs-
  resample tail difference fixed in r4),
- color-distortion output moments for both fast and full modes
  (two-sample KS on per-image mean and std),
- random-zoom target-size distribution.

The reference implementation is imported as an oracle only (sanctioned in
CLAUDE.md); nothing from it ships at runtime.
"""

import os
import sys

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")
scipy_stats = pytest.importorskip("scipy.stats")

from test_keras_import_oracle import _install_keras2_shims  # noqa: E402

REFERENCE_DIR = "/root/reference"

# Two-sample KS acceptance: with N~500 per side this rejects distribution
# errors like a swapped parameter range or a clamped tail, while staying
# stable across RNG seeds (p-values are uniform under H0; 1e-3 gives a
# 0.1% flake rate per statistic).
KS_P = 1e-3
N = 500


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """(reference NABGenerator, our NABDataset, image paths) over a tiny
    synthesized NAB-format dataset of coordinate-encoded PNGs."""
    _install_keras2_shims()
    # force-front: mid-session path churn must not shadow the reference
    if REFERENCE_DIR in sys.path:
        sys.path.remove(REFERENCE_DIR)
    sys.path.insert(0, REFERENCE_DIR)
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    from PIL import Image

    from datasets.nab import NABGenerator  # the reference's own loader

    from semantic_embeddings_tpu.data.datasets import NABDataset

    root = str(tmp_path_factory.mktemp("nab_oracle"))
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    def coord_png(name, h, w):
        # ch0 = row index, ch1 = col index, ch2 = noise; lossless PNG so
        # crop/pad offsets are exactly recoverable from any pixel
        arr = np.zeros((h, w, 3), np.uint8)
        arr[..., 0] = np.arange(h)[:, None]
        arr[..., 1] = np.arange(w)[None, :]
        arr[..., 2] = np.random.default_rng(hash(name) % 2**31).integers(
            0, 256, (h, w))
        path = os.path.join(root, "images", name)
        Image.fromarray(arr).save(path)
        return path

    big = coord_png("big.png", 40, 40)      # crop case (40 -> 32)
    small = coord_png("small.png", 24, 24)  # reflect-pad case (24 -> 32)
    exact = coord_png("exact.png", 32, 32)  # flip/erase/distort case

    with open(os.path.join(root, "images.txt"), "w") as f:
        f.write("1 big.png\n2 small.png\n3 exact.png\n")
    with open(os.path.join(root, "train_test_split.txt"), "w") as f:
        f.write("1 1\n2 1\n3 0\n")
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        f.write("1 1\n2 1\n3 1\n")

    mean = [100.0, 110.0, 120.0]
    std = [50.0, 55.0, 60.0]
    kw = dict(cropsize=(32, 32), default_target_size=-1, mean=mean, std=std)
    ref = NABGenerator(root, **kw)
    ours = NABDataset(root, **kw)
    return ref, ours, {"big": big, "small": small, "exact": exact}


def _ks_agree(a, b, what):
    stat = scipy_stats.ks_2samp(np.asarray(a, float), np.asarray(b, float))
    assert stat.pvalue > KS_P, (
        f"{what}: distributions differ (KS={stat.statistic:.4f}, "
        f"p={stat.pvalue:.2e}; ref mean {np.mean(a):.4f} vs ours "
        f"{np.mean(b):.4f})"
    )


def test_crop_and_pad_offsets(oracle):
    """Random-crop offsets (image > crop) and reflect-pad offsets
    (image < crop) follow the same uniform integer law on both sides."""
    ref, ours, paths = oracle
    np.random.seed(1)
    rng = np.random.default_rng(2)

    def ref_offsets(path, n):
        ys, xs = [], []
        for _ in range(n):
            out = ref.compose_batch([path], cropsize=(32, 32), randcrop=True,
                                    normalize=False, target_size=-1)[0]
            ys.append(int(out[0, 0, 0]))
            xs.append(int(out[0, 0, 1]))
        return np.array(ys), np.array(xs)

    def our_offsets(path, n):
        ys, xs = [], []
        for _ in range(n):
            out = ours._load_crop(path, train=True, rng=rng)
            ys.append(int(out[0, 0, 0]))
            xs.append(int(out[0, 0, 1]))
        return np.array(ys), np.array(xs)

    # crop case: pixel (0,0) of the crop is source pixel (y_offs, x_offs)
    ry, rx = ref_offsets(paths["big"], N)
    oy, ox = our_offsets(paths["big"], N)
    assert set(ry) | set(oy) <= set(range(9)) and set(rx) | set(ox) <= set(
        range(9))
    _ks_agree(ry, oy, "crop y-offset")
    _ks_agree(rx, ox, "crop x-offset")
    # both uniform on 0..8: every offset occurs
    assert len(set(oy)) == 9 and len(set(ry)) == 9

    # pad case: source row 0 (ch0 == 0 with ch1 == 0 at some column) lands
    # at row y_pad; reflect padding mirrors rows so ch0 at (0,*) equals
    # y_pad for y_pad <= 23 (always true: pad <= 8)
    def pad_offsets(fn, n, which):
        ys = []
        for _ in range(n):
            if which == "ref":
                out = ref.compose_batch([paths[fn]], cropsize=(32, 32),
                                        randcrop=True, normalize=False,
                                        target_size=-1)[0]
            else:
                out = ours._load_crop(paths[fn], train=True, rng=rng)
            # reflect of row r at pad p shows ch0 value |...|; row y_pad
            # holds source row 0, rows above mirror rows 1..: ch0[0,.]
            # == y_pad exactly
            ys.append(int(out[0, 16, 0]))
        return np.array(ys)

    rpy = pad_offsets("small", N, "ref")
    opy = pad_offsets("small", N, "ours")
    assert set(rpy) | set(opy) <= set(range(9))
    _ks_agree(rpy, opy, "reflect-pad y-offset")


def test_flip_rate_and_action(oracle):
    """hflip: 50% rate on both sides, and the flip is the same operation
    (width-axis reversal after normalization)."""
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import augment

    ref, ours, paths = oracle
    from PIL import Image

    img = Image.open(paths["exact"]).convert("RGB")
    np.random.seed(3)
    clean = ref._transform(img, normalize=False, hflip=False)
    flipped = clean[:, ::-1, :]
    ref_flips = 0
    for _ in range(N):
        out = ref._transform(img, normalize=False, hflip=True)
        if np.array_equal(out, flipped):
            ref_flips += 1
        else:
            assert np.array_equal(out, clean)

    batch = jnp.asarray(np.repeat(clean[None], N, axis=0))
    out = np.asarray(augment.random_flip(batch, jax.random.PRNGKey(4),
                                         horizontal=True))
    our_flips = 0
    for i in range(N):
        if np.array_equal(out[i], flipped):
            our_flips += 1
        else:
            assert np.array_equal(out[i], clean)
    # binomial(N, .5): 4-sigma band
    band = 4 * 0.5 * np.sqrt(N)
    assert abs(ref_flips - N / 2) < band, ref_flips
    assert abs(our_flips - N / 2) < band, our_flips


def _erase_boxes(outs, clean):
    """Recovers (area_fraction, log aspect) of each erased rectangle."""
    areas, ratios = [], []
    h, w = clean.shape[:2]
    for out in outs:
        diff = np.any(out != clean, axis=-1)
        ys, xs = np.nonzero(diff)
        assert len(ys), "erase did not fire at probability 1"
        he = ys.max() - ys.min() + 1
        we = xs.max() - xs.min() + 1
        # the box is solid: every cell inside differs
        assert diff[ys.min():ys.min() + he, xs.min():xs.min() + we].all()
        areas.append(he * we / (h * w))
        ratios.append(np.log(he / we))
    return np.array(areas), np.array(ratios)


def test_random_erasing_distribution(oracle):
    """Erased-box area and aspect distributions match the reference's
    rejection-sampled law (``datasets/common.py:531-540``) — including the
    tail where candidate boxes exceed the image and must be re-drawn."""
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import augment

    ref, ours, paths = oracle
    from PIL import Image

    img = Image.open(paths["exact"]).convert("RGB")
    np.random.seed(5)
    ref.randerase_prob = 1.0
    try:
        clean = ref._transform(img, normalize=True, randerase=False)
        ref_outs = [ref._transform(img, normalize=True, randerase=True)
                    for _ in range(N)]
    finally:
        ref.randerase_prob = 0.5
    ref_area, ref_ratio = _erase_boxes(ref_outs, clean)

    batch = jnp.asarray(np.repeat(clean[None], N, axis=0))
    out = np.asarray(augment.random_erasing(
        batch, jax.random.PRNGKey(6), ours.mean, ours.std, probability=1.0,
        **{k: ref.randerase_params[k] for k in ("sl", "sh", "r1", "r2")},
    ))
    our_area, our_ratio = _erase_boxes(out, clean)

    _ks_agree(ref_area, our_area, "erase area fraction")
    _ks_agree(ref_ratio, our_ratio, "erase log-aspect")


@pytest.mark.parametrize("fast_mode", [True, False])
def test_distort_color_moments(oracle, fast_mode):
    """Color-distortion output-moment distributions match per mode (the
    orderings, parameter ranges and clipping all shape these)."""
    import jax
    import jax.numpy as jnp

    from datasets.common import distort_color as ref_distort

    from semantic_embeddings_tpu.data import augment

    ref, ours, paths = oracle
    from PIL import Image

    img = np.asarray(Image.open(paths["exact"]).convert("RGB"), np.float32)
    np.random.seed(7)
    kw = dict(fast_mode=fast_mode, brightness_delta=32.0 / 255.0,
              hue_delta=0.2, saturation_range=(0.5, 1.5),
              contrast_range=(0.5, 1.5))
    ref_means, ref_stds = [], []
    for _ in range(N):
        out = ref_distort(img.copy(), **kw)
        ref_means.append(out.mean())
        ref_stds.append(out.std())

    batch = jnp.asarray(np.repeat(img[None], N, axis=0))
    out = np.asarray(augment.distort_color(batch, jax.random.PRNGKey(8),
                                           **kw))
    _ks_agree(ref_means, out.mean(axis=(1, 2, 3)), f"distort mean "
              f"(fast={fast_mode})")
    _ks_agree(ref_stds, out.std(axis=(1, 2, 3)), f"distort std "
              f"(fast={fast_mode})")


def test_randzoom_size_distribution(oracle):
    """Integer randzoom: resized shorter-side distribution matches
    (``datasets/common.py:455-462`` np.random.randint convention)."""
    ref, ours, paths = oracle
    from PIL import Image

    np.random.seed(9)
    ref.randzoom_range = (30, 50)
    ours.randzoom_range = (30, 50)
    try:
        ref_sizes = [min(ref._load_image(paths["big"], randzoom=True).size)
                     for _ in range(N)]
        rng = np.random.default_rng(10)
        our_sizes = [
            min(ours._resize_target(Image.open(paths["big"]).convert("RGB"),
                                    None, rng, randzoom=True).size)
            for _ in range(N)
        ]
    finally:
        ref.randzoom_range = None
        ours.randzoom_range = None
    assert min(ref_sizes) >= 30 and max(ref_sizes) <= 49
    assert min(our_sizes) >= 30 and max(our_sizes) <= 49
    _ks_agree(ref_sizes, our_sizes, "randzoom shorter side")


def test_eval_path_pixel_parity(oracle):
    """The deterministic path (center crop + normalize) is numerically
    identical, not just statistically alike."""
    import jax

    ref, ours, paths = oracle
    ref_out = ref.compose_batch([paths["big"]], cropsize=(32, 32),
                                randcrop=False, normalize=True,
                                target_size=-1)[0]
    rng = np.random.default_rng(0)
    crop = ours._load_crop(paths["big"], train=False, rng=rng)
    prep = ours.make_prepare()
    img, _ = prep({"image": crop[None], "label": np.zeros(1, np.int64)},
                  jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(img)[0], ref_out, rtol=0,
                               atol=1e-4)
