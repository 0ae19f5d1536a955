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


class TestExactTopK:
    """ops/topk.exact_topk must equal lax.top_k exactly, including tie
    order (smallest index wins), for any chunking."""

    def test_randomized_tie_parity(self):
        import jax.numpy as jnp
        from jax import lax

        from semantic_embeddings_tpu.ops.topk import exact_topk

        rng = np.random.default_rng(7)
        for _ in range(30):
            b = int(rng.integers(1, 4))
            n = int(rng.integers(10, 3000))
            k = int(rng.integers(1, min(n, 260) + 1))
            chunk = int(rng.integers(max(k, 8), 600))
            # heavy ties: few distinct values
            x = jnp.asarray(rng.integers(0, 5, (b, n)).astype(np.float32))
            v1, i1 = lax.top_k(x, k)
            v2, i2 = exact_topk(x, k, chunk=chunk)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_small_row_passthrough_and_payload(self):
        import jax.numpy as jnp
        from jax import lax

        from semantic_embeddings_tpu.ops.topk import (
            exact_topk,
            exact_topk_payload,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 40)).astype(np.float32))
        v, i = exact_topk(x, 5, chunk=64)  # n <= chunk: lax.top_k path
        vr, ir = lax.top_k(x, 5)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
        payload = jnp.asarray(rng.integers(0, 9, 40))
        v2, p2 = exact_topk_payload(x, payload, 5, chunk=8)
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(payload[ir]))

    def test_k_too_large_raises(self):
        import jax.numpy as jnp
        import pytest

        from semantic_embeddings_tpu.ops.topk import exact_topk

        with pytest.raises(ValueError, match="k=9"):
            exact_topk(jnp.zeros((1, 4)), 9)


def test_exact_topk_inf_heavy_rows():
    """Padding uses -inf; rows that THEMSELVES contain -inf (masked
    columns, whole -inf tails) must still match lax.top_k exactly —
    padding can only lose ties because real candidates always occupy
    earlier candidate positions."""
    from jax import lax

    from semantic_embeddings_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(11)
    for _ in range(15):
        n = int(rng.integers(300, 4000))
        k = int(rng.integers(1, 280))
        chunk = int(rng.integers(max(k, 64), 1500))
        x = rng.normal(size=(2, n)).astype(np.float32)
        mask = rng.random((2, n)) < rng.uniform(0.3, 0.95)
        x[mask] = -np.inf
        x[:, int(n * 0.7):] = -np.inf
        xj = jnp.asarray(x)
        v1, i1 = lax.top_k(xj, k)
        v2, i2 = exact_topk(xj, k, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_conv3x3_bn_stats_matches_xla():
    """Pallas fused conv+BN-stats (interpret mode) must equal the unfused
    XLA conv -> convert -> reduce chain, incl. bf16 rounding of y."""
    from tools.fused_conv_bn_prototype import (
        conv3x3_bn_stats,
        conv3x3_bn_stats_reference,
    )

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)).astype(np.float32),
                        dtype=dtype)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 8)).astype(np.float32),
                        dtype=dtype)
        y, s, ss = conv3x3_bn_stats(x, w, interpret=True)
        yr, sr, ssr = conv3x3_bn_stats_reference(x, w)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(yr, np.float32),
            rtol=0, atol=5e-6)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(ssr),
                                   rtol=1e-5, atol=1e-3)
