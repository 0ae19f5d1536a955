"""Loss functions vs. closed-form values (reference semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.train import losses as L


def test_squared_and_mean_distance():
    y = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    p = jnp.asarray([[4.0, 6.0], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(L.squared_distance(y, p)), [25.0, 0.0])
    np.testing.assert_allclose(np.asarray(L.mean_distance(y, p)), [5.0, 0.0])


def test_inv_correlation():
    y = jnp.asarray([[1.0, 0.0]])
    p = jnp.asarray([[0.6, 0.8]])
    assert float(L.inv_correlation(y, p)[0]) == pytest.approx(0.4)


def test_categorical_crossentropy_keras_clipping():
    onehot = jnp.asarray([[0.0, 1.0]])
    # prob exactly 0 for the true class: Keras clips at 1e-7 -> -log(1e-7)
    probs = jnp.asarray([[1.0, 0.0]])
    val = float(L.categorical_crossentropy(onehot, probs)[0])
    assert val == pytest.approx(-np.log(1e-7 / (1e-7 + (1 - 1e-7))), rel=1e-3)
    # perfect prediction -> ~0
    probs = jnp.asarray([[0.0, 1.0]])
    assert float(L.categorical_crossentropy(onehot, probs)[0]) < 1e-5


def test_label_smoothing_formula():
    onehot = jnp.asarray([[1.0, 0.0, 0.0]])
    sm = np.asarray(L.label_smoothing(onehot, 0.1))
    # learn_classifier.py:17-22: true*(1-s), others s/(n-1)
    np.testing.assert_allclose(sm, [[0.9, 0.05, 0.05]], atol=1e-7)
    # out-of-range smoothing is a no-op
    np.testing.assert_allclose(
        np.asarray(L.label_smoothing(onehot, 0.0)), np.asarray(onehot)
    )


def test_center_loss_value():
    emb = jnp.asarray([[1.0, 1.0]])
    centroids = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    targets = jnp.asarray([1])
    # ||(1,1)-(1,0)||^2 / 2 = 0.5
    assert float(L.center_loss(emb, centroids, targets)[0]) == pytest.approx(0.5)


def test_softmax_crossentropy_logits_matches_probs_path():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    onehot = jnp.asarray(np.eye(7, dtype=np.float32)[[0, 3, 5, 6]])
    via_logits = np.asarray(L.softmax_crossentropy_logits(onehot, logits))
    import jax

    via_probs = np.asarray(
        L.categorical_crossentropy(onehot, jax.nn.softmax(logits))
    )
    np.testing.assert_allclose(via_logits, via_probs, rtol=1e-5)


def test_labelembed_loss_shape_and_gradients():
    import jax

    rng = np.random.default_rng(0)
    out1 = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    out2 = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    tar = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    targets = jnp.asarray(np.arange(6) % 4)
    loss = L.labelembed_loss(out1, out2, tar, targets)
    assert loss.shape == (6,)
    g = jax.grad(lambda o: L.labelembed_loss(o, out2, tar, targets).mean())(out1)
    assert np.isfinite(np.asarray(g)).all()
    # stop-gradients: tar gradient flows only through the L_emb_o2 branch;
    # out2's soft targets are stopped.
    g2 = jax.grad(
        lambda o2: L.labelembed_loss(out1, o2, tar, targets).mean()
    )(out2)
    assert np.isfinite(np.asarray(g2)).all()
