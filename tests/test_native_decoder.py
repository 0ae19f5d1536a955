"""Native C++ JPEG decode/resize/crop core vs. the PIL path."""

import os

import numpy as np
import pytest

from semantic_embeddings_tpu import native


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(80, 60), (45, 90), (32, 32), (200, 150)]):
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        p = str(root / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    # one grayscale and one corrupt file
    g = str(root / "gray.jpg")
    Image.fromarray(rng.integers(0, 256, (50, 50)).astype(np.uint8), "L").save(g)
    paths.append(g)
    bad = str(root / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    paths.append(bad)
    return paths


def test_native_builds():
    lib = native.loader()
    assert lib is not None, "native decoder failed to build"


def test_decode_batch_shapes_and_failures(jpeg_dir):
    n = len(jpeg_dir)
    batch, ok = native.decode_batch(
        jpeg_dir, [48] * n, list(range(1, n + 1)), random_crop=False,
        crop_h=40, crop_w=40,
    )
    assert batch.shape == (n, 40, 40, 3)
    assert ok[:5].all()      # all real JPEGs incl. grayscale decode
    assert not ok[5]         # the corrupt file fails cleanly
    # Gray image expands to identical RGB channels.
    gray = batch[4]
    assert np.array_equal(gray[..., 0], gray[..., 1])


def test_matches_pil_center_crop(jpeg_dir):
    """Center-crop path must closely match PIL decode+resize+crop."""
    from PIL import Image

    path = jpeg_dir[3]  # 200x150 -> plenty of downscale
    batch, ok = native.decode_batch(
        [path], [64], [7], random_crop=False, crop_h=56, crop_w=56
    )
    assert ok[0]

    img = Image.open(path)
    w, h = img.size
    if w < h:
        target = (64, round(h * 64 / w))
    else:
        target = (round(w * 64 / h), 64)
    ref = np.asarray(img.resize(target, Image.BILINEAR), dtype=np.int16)
    rh, rw = ref.shape[:2]
    oy, ox = (rh - 56) // 2, (rw - 56) // 2
    ref_crop = ref[oy : oy + 56, ox : ox + 56]
    diff = np.abs(batch[0].astype(np.int16) - ref_crop)
    # DCT-scaled decode + a different bilinear kernel: allow small deviation.
    assert float(diff.mean()) < 12.0, float(diff.mean())


def test_mem_batch_matches_file_batch(jpeg_dir):
    """decode_mem_batch (serving path) == decode_batch on the same bytes."""
    blobs = [open(p, "rb").read() for p in jpeg_dir]
    n = len(blobs)
    sizes, seeds = [48] * n, list(range(1, n + 1))
    want, ok_f = native.decode_batch(jpeg_dir, sizes, seeds,
                                     random_crop=True, crop_h=40, crop_w=40)
    got, ok_m = native.decode_mem_batch(blobs, sizes, seeds,
                                        random_crop=True, crop_h=40,
                                        crop_w=40)
    np.testing.assert_array_equal(ok_f, ok_m)
    assert not ok_m[5]  # the corrupt buffer fails cleanly, no crash
    np.testing.assert_array_equal(want[ok_f], got[ok_m])


def test_truncated_and_corrupt_jpegs_never_crash(jpeg_dir, tmp_path):
    """Untrusted-bytes robustness for the serving path: mid-stream
    truncation decodes LENIENTLY (libjpeg's standard recovery pads the
    missing scanlines — full-shape output, ok=1), header corruption fails
    with ok=0, and neither crashes or corrupts state across many repeats
    (the scanline scratch must not leak under error longjmps)."""
    blob = open(jpeg_dir[3], "rb").read()   # 200x150 image
    trunc = blob[: int(len(blob) * 0.5)]
    garbage = blob[:2] + b"\xff\x00" * 40   # valid SOI, broken markers
    for _ in range(50):
        out, ok = native.decode_mem_batch(
            [trunc, garbage], [64, 64], [1, 2], False, 56, 56)
        assert ok[0] and not ok[1]
        assert out[0].shape == (56, 56, 3)


def test_deterministic_random_crops(jpeg_dir):
    a, _ = native.decode_batch(
        jpeg_dir[:4], [48] * 4, [11, 22, 33, 44], random_crop=True,
        crop_h=40, crop_w=40,
    )
    b, _ = native.decode_batch(
        jpeg_dir[:4], [48] * 4, [11, 22, 33, 44], random_crop=True,
        crop_h=40, crop_w=40,
    )
    np.testing.assert_array_equal(a, b)
    c, _ = native.decode_batch(
        jpeg_dir[:4], [48] * 4, [99, 98, 97, 96], random_crop=True,
        crop_h=40, crop_w=40,
    )
    assert not np.array_equal(a, c)


