"""On-device image augmentation (runs inside the jitted train step).

The reference augments on the host with per-image Python/PIL work inside
multiprocessing workers (``/root/reference/datasets/common.py:380-581``,
Keras ``ImageDataGenerator`` for CIFAR).  Here augmentation is a pure
``jnp`` function of (batch, PRNG key): XLA fuses it with the forward pass,
the batch never leaves HBM, and the host only ships integer indices.

Parity notes:
- Affine shift/zoom uses the same continuous parameter ranges as Keras with
  bilinear resampling and nearest (edge-clamp) fill, implemented as one
  ``map_coordinates`` gather per image under ``vmap``.
- Random erasing (Zhong et al.) matches ``datasets/common.py:530-540``: area
  and aspect ratio sampled in the same ranges, filled with uniform noise in
  normalized space.  The reference's ``while True`` rejection loop becomes a
  shape-static 12-candidate first-valid draw (same conditional law; see
  ``random_erasing``).
- Horizontal/vertical flips and mean/std normalization are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_sample(img, ty, tx, zy, zx, flip):
    """Samples one HWC image at zoomed/translated/flipped coordinates.

    The output pixel (y, x) reads input position
    ``(y - cy) * zy + cy - ty`` (Keras transform convention: zoom about the
    center, then translate), with bilinear interpolation and edge clamping.
    """
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32) - cy) * zy + cy - ty
    xs = (jnp.arange(w, dtype=jnp.float32) - cx) * zx + cx - tx
    xs = jnp.where(flip, (w - 1) - xs, xs)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]

    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def random_affine_batch(
    images,
    key,
    *,
    width_shift=0.0,
    height_shift=0.0,
    zoom=0.0,
    hflip=False,
    vflip=False,
):
    """Keras-style random shift / zoom / flip for a batch (B, H, W, C)."""
    b, h, w, _ = images.shape
    k_ty, k_tx, k_z, k_hf, k_vf = jax.random.split(key, 5)
    ty = (
        jax.random.uniform(k_ty, (b,), minval=-height_shift, maxval=height_shift)
        * h
        if height_shift
        else jnp.zeros((b,))
    )
    tx = (
        jax.random.uniform(k_tx, (b,), minval=-width_shift, maxval=width_shift)
        * w
        if width_shift
        else jnp.zeros((b,))
    )
    if zoom:
        z = jax.random.uniform(
            k_z, (b, 2), minval=1.0 - zoom, maxval=1.0 + zoom
        )
        zy, zx = z[:, 0], z[:, 1]
    else:
        zy = zx = jnp.ones((b,))
    flip_h = (
        jax.random.bernoulli(k_hf, 0.5, (b,))
        if hflip
        else jnp.zeros((b,), dtype=bool)
    )

    out = jax.vmap(_affine_sample)(images, ty, tx, zy, zx, flip_h)
    if vflip:
        fv = jax.random.bernoulli(k_vf, 0.5, (b,))
        out = jnp.where(fv[:, None, None, None], out[:, ::-1], out)
    return out


def random_flip(images, key, horizontal=True, vertical=False):
    """Exact 50% flips without resampling (for the file-dataset path)."""
    kh, kv = jax.random.split(key)
    if horizontal:
        f = jax.random.bernoulli(kh, 0.5, (images.shape[0],))
        images = jnp.where(f[:, None, None, None], images[:, :, ::-1], images)
    if vertical:
        f = jax.random.bernoulli(kv, 0.5, (images.shape[0],))
        images = jnp.where(f[:, None, None, None], images[:, ::-1], images)
    return images


def normalize(images, mean, std, bgr=False):
    """(x - mean) / std with RGB stats; optional RGB->BGR reorder afterwards
    (``datasets/common.py:514-520``)."""
    mean = jnp.asarray(mean, dtype=images.dtype)
    std = jnp.asarray(std, dtype=images.dtype)
    out = (images - mean) / std
    if bgr:
        out = out[..., ::-1]
    return out


def random_erasing(
    images,
    key,
    mean,
    std,
    *,
    probability=0.5,
    sl=0.02,
    sh=0.4,
    r1=0.3,
    r2=1.0 / 0.3,
):
    """Random erasing in normalized space (``datasets/common.py:530-540``).

    Patch area in [sl, sh] * image area, aspect in [r1, r2], filled with
    uniform [0,255] noise normalized by (mean, std).  Out-of-range patches
    are RE-SAMPLED like the reference's ``while True`` rejection loop
    (``datasets/common.py:531-537``): 12 candidate (area, ratio) draws per
    image, first in-range wins — the all-invalid probability is ~1e-16 at
    the published parameters, where a single draw is invalid ~4% of the
    time (a clamp instead would pile that tail mass onto the max patch
    size; the r4 augmentation-distribution oracle is sharp enough to see
    it).
    """
    b, h, w, c = images.shape
    k_p, k_s, k_r, k_x, k_y, k_n = jax.random.split(key, 6)
    tries = 12
    apply = jax.random.bernoulli(k_p, probability, (b,))
    area = jax.random.uniform(k_s, (b, tries), minval=sl, maxval=sh) * (h * w)
    ratio = jax.random.uniform(k_r, (b, tries), minval=r1, maxval=r2)
    he_c = jnp.sqrt(area * ratio).astype(jnp.int32)
    we_c = jnp.sqrt(area / ratio).astype(jnp.int32)
    valid = (he_c < h) & (we_c < w)
    # index of the first valid candidate (argmax of a boolean row); if
    # none is valid (vanishing probability), fall back to a clamped last
    pick = jnp.argmax(valid, axis=1)
    he = jnp.take_along_axis(he_c, pick[:, None], axis=1)[:, 0]
    we = jnp.take_along_axis(we_c, pick[:, None], axis=1)[:, 0]
    he = jnp.clip(he, 1, h - 1)  # also covers the ~1e-16 all-invalid case
    we = jnp.clip(we, 1, w - 1)
    ye = (jax.random.uniform(k_y, (b,)) * (h - he)).astype(jnp.int32)
    xe = (jax.random.uniform(k_x, (b,)) * (w - we)).astype(jnp.int32)

    noise = jax.random.uniform(k_n, images.shape, minval=0.0, maxval=255.0)
    noise = (noise - jnp.asarray(mean)) / jnp.asarray(std)

    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    in_patch = (
        (rows >= ye[:, None, None])
        & (rows < (ye + he)[:, None, None])
        & (cols >= xe[:, None, None])
        & (cols < (xe + we)[:, None, None])
        & apply[:, None, None]
    )
    return jnp.where(in_patch[..., None], noise, images)


def rgb_to_hsv(rgb):
    """Channels-last RGB [0,1] -> HSV [0,1] (matplotlib convention)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-20), 0.0)
    safe = jnp.maximum(delta, 1e-20)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """Channels-last HSV [0,1] -> RGB [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def distort_color(
    images,
    key,
    fast_mode=True,
    brightness_delta=32.0 / 255.0,
    hue_delta=0.2,
    saturation_range=(0.5, 1.5),
    contrast_range=(0.5, 1.5),
):
    """Random color distortion on device (``datasets/common.py:848-946``).

    Inputs in [0, 255]; per-image random parameters.  Fast mode perturbs
    brightness (HSV value) and saturation — these act on disjoint HSV
    channels, so the reference's random op ordering is a no-op and a single
    combined application is exact.  Full mode applies brightness / hue /
    saturation / contrast in one of the reference's four orderings chosen
    per image (``lax.switch``).
    """
    b = images.shape[0]
    x = images / 255.0
    keys = jax.random.split(key, 6)
    bright = jax.random.uniform(
        keys[0], (b,), minval=-brightness_delta, maxval=brightness_delta
    )
    sat = jax.random.uniform(
        keys[1], (b,), minval=saturation_range[0], maxval=saturation_range[1]
    )

    if fast_mode:
        hsv = rgb_to_hsv(x)
        h = hsv[..., 0]
        s = jnp.clip(hsv[..., 1] * sat[:, None, None], 0.0, 1.0)
        v = jnp.clip(hsv[..., 2] + bright[:, None, None], 0.0, 1.0)
        out = hsv_to_rgb(jnp.stack([h, s, v], axis=-1))
        return out * 255.0

    hue = jax.random.uniform(keys[2], (b,), minval=-hue_delta, maxval=hue_delta)
    contrast = jax.random.uniform(
        keys[3], (b, 1, 1, 3), minval=contrast_range[0],
        maxval=contrast_range[1],
    )
    order = jax.random.randint(keys[4], (b,), 0, 4)

    def apply_one(img, br, st, hu, cf, ordering):
        def brightness_fn(y):
            return jnp.clip(y + br, 0.0, 1.0)

        def hue_sat_fn(y, do_bright_hsv=False):
            hsv = rgb_to_hsv(y)
            h = (hsv[..., 0] + hu) % 1.0
            s = jnp.clip(hsv[..., 1] * st, 0.0, 1.0)
            v = hsv[..., 2]
            if do_bright_hsv:
                v = jnp.clip(v + br, 0.0, 1.0)
            return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))

        def contrast_fn(y):
            mean = y.mean(axis=(0, 1), keepdims=True)
            return jnp.clip((y - mean) * cf + mean, 0.0, 1.0)

        def sat_fn(y):
            hsv = rgb_to_hsv(y)
            s = jnp.clip(hsv[..., 1] * st, 0.0, 1.0)
            return hsv_to_rgb(
                jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))

        def hue_fn(y):
            hsv = rgb_to_hsv(y)
            h = (hsv[..., 0] + hu) % 1.0
            return hsv_to_rgb(
                jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))

        branches = [
            # Reference orderings (datasets/common.py:880-887), ops that
            # act on disjoint HSV channels merged into one round trip:
            # 0: brightness -> sat -> hue -> contrast
            lambda y: contrast_fn(hue_sat_fn(brightness_fn(y))),
            # 1: SAT FIRST -> brightness -> contrast -> hue (saturation
            # does not commute with RGB brightness/contrast, so it needs
            # its own HSV round trip like the reference's)
            lambda y: hue_fn(contrast_fn(brightness_fn(sat_fn(y)))),
            # 2: contrast -> hue -> brightness(HSV value) -> sat
            lambda y: hue_sat_fn(contrast_fn(y), do_bright_hsv=True),
            # 3: hue -> sat -> contrast -> brightness
            lambda y: brightness_fn(contrast_fn(hue_sat_fn(y))),
        ]
        return jax.lax.switch(ordering, branches, img)

    out = jax.vmap(apply_one)(x, bright, sat, hue, contrast[:, 0, 0, :], order)
    return out * 255.0


def random_crop_batch(images, key, crop_h, crop_w):
    """Random crop with static output shape via per-image dynamic slices.

    Inputs must already be at least (crop_h, crop_w); used by the
    file-dataset path where the host delivers fixed-size decode targets.
    """
    b, h, w, c = images.shape
    ky, kx = jax.random.split(key)
    oy = (jax.random.uniform(ky, (b,)) * (h - crop_h + 1)).astype(jnp.int32)
    ox = (jax.random.uniform(kx, (b,)) * (w - crop_w + 1)).astype(jnp.int32)

    def crop(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (crop_h, crop_w, c))

    return jax.vmap(crop)(images, oy, ox)


def center_crop_batch(images, crop_h, crop_w):
    b, h, w, c = images.shape
    oy, ox = (h - crop_h) // 2, (w - crop_w) // 2
    return images[:, oy : oy + crop_h, ox : ox + crop_w, :]
