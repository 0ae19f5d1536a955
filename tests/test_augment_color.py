"""Color-space conversions and color distortion on device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.data import augment


@pytest.fixture(scope="module")
def rgb(rng):
    return rng.uniform(0, 1, (3, 12, 12, 3)).astype(np.float32)


def test_hsv_roundtrip(rgb):
    hsv = augment.rgb_to_hsv(jnp.asarray(rgb))
    back = augment.hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-5)


def test_hsv_matches_matplotlib(rgb):
    from matplotlib.colors import rgb_to_hsv as mpl_rgb_to_hsv

    ours = np.asarray(augment.rgb_to_hsv(jnp.asarray(rgb)))
    ref = mpl_rgb_to_hsv(rgb)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("fast", [True, False])
def test_distort_color_bounds(rgb, fast):
    imgs = jnp.asarray(rgb * 255.0)
    out = jax.jit(
        lambda x, k: augment.distort_color(x, k, fast_mode=fast)
    )(imgs, jax.random.PRNGKey(0))
    arr = np.asarray(out)
    assert arr.shape == imgs.shape
    assert arr.min() >= -1e-3 and arr.max() <= 255.0 + 1e-3
    # something actually changed
    assert not np.allclose(arr, np.asarray(imgs))


def test_distort_color_nab_params(rgb):
    # NAB config: no hue shift, saturation in (0.8, 1.2)
    imgs = jnp.asarray(rgb * 255.0)
    out = augment.distort_color(
        imgs, jax.random.PRNGKey(1), fast_mode=True,
        hue_delta=0.0, saturation_range=(0.8, 1.2),
    )
    # hue channel preserved under fast mode with these params
    h_in = np.asarray(augment.rgb_to_hsv(imgs / 255.0))[..., 0]
    h_out = np.asarray(augment.rgb_to_hsv(out / 255.0))[..., 0]
    np.testing.assert_allclose(h_out, h_in, atol=1e-3)
