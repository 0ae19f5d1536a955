"""Pallas cosine-loss op: numerics and gradients vs. the composed jnp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models.heads import l2norm
from semantic_embeddings_tpu.ops import fused_cosine_loss
from semantic_embeddings_tpu.train.losses import inv_correlation


@pytest.fixture(scope="module")
def data(rng):
    z = jnp.asarray(rng.normal(size=(64, 100)).astype(np.float32)) * 3.0
    t = jnp.asarray(rng.normal(size=(64, 100)).astype(np.float32))
    t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
    return z, t


def test_forward_matches_composed(data):
    z, t = data
    fused = fused_cosine_loss(z, t)
    composed = inv_correlation(t, l2norm(z))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=1e-5, atol=1e-6)


def test_gradient_matches_composed(data):
    z, t = data

    g_fused = jax.grad(lambda z: fused_cosine_loss(z, t).sum())(z)
    g_comp = jax.grad(lambda z: inv_correlation(t, l2norm(z)).sum())(z)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_comp),
                               rtol=1e-4, atol=1e-5)


def test_gradient_weighted(data):
    z, t = data
    w = jnp.linspace(0.1, 2.0, z.shape[0])
    g_fused = jax.grad(lambda z: (fused_cosine_loss(z, t) * w).sum())(z)
    g_comp = jax.grad(lambda z: (inv_correlation(t, l2norm(z)) * w).sum())(z)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_comp),
                               rtol=1e-4, atol=1e-5)


def test_zero_vector_stable():
    z = jnp.zeros((4, 16))
    t = jnp.ones((4, 16)) / 4.0
    loss = fused_cosine_loss(z, t)
    grad = jax.grad(lambda z: fused_cosine_loss(z, t).sum())(z)
    assert np.isfinite(np.asarray(loss)).all()
    assert np.isfinite(np.asarray(grad)).all()


def test_under_jit_and_vmapless_shapes(data):
    z, t = data
    jitted = jax.jit(lambda z, t: fused_cosine_loss(z, t).mean())
    val = float(jitted(z, t))
    assert np.isfinite(val)
    # Odd batch size (not a multiple of the kernel tile).
    val2 = float(jitted(z[:37], t[:37]))
    assert np.isfinite(val2)
