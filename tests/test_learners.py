"""Baseline learners: label-embedding net, center loss, DeViSE pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models import build_network
from semantic_embeddings_tpu.models.learners import CenterLossModel, LabelEmbedModel
from semantic_embeddings_tpu.train import new_train_state
from semantic_embeddings_tpu.train.losses import devise_ranking_loss
from semantic_embeddings_tpu.train.optimizer import adagrad_update
from semantic_embeddings_tpu.train.special import (
    make_center_loss_eval_step,
    make_center_loss_train_step,
    make_labelembed_eval_step,
    make_labelembed_train_step,
)


def _backbone():
    return build_network(16, "simple").module


def _data(n=32, nc=4):
    rng = np.random.default_rng(0)
    labels = np.arange(n) % nc
    images = rng.normal(0, 0.1, (n, 8, 8, 3)).astype(np.float32)
    images += labels[:, None, None, None] / nc
    return jnp.asarray(images), jnp.asarray(labels.astype(np.int32))


def _prepare(raw, rng, train):
    return raw["image"], raw["label"]


def test_labelembed_model_and_step():
    model = LabelEmbedModel(backbone=_backbone(), num_classes=4)
    images, labels = _data()
    variables = model.init(jax.random.PRNGKey(0), images, labels, train=False)
    # identity-initialized label embeddings
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["labelembeddings"]), np.eye(4)
    )
    state = new_train_state(variables)
    step = make_labelembed_train_step(model, _prepare)
    raw = {"image": images, "label": labels}
    first = None
    for _ in range(8):
        state, metrics = step(state, raw, 0.05, jax.random.PRNGKey(1))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    eval_step = make_labelembed_eval_step(model, _prepare)
    m = eval_step(state, raw, jax.random.PRNGKey(0))
    assert float(m["count"]) == 32.0


def test_center_loss_learned_centroids():
    model = CenterLossModel(
        backbone=_backbone(), num_classes=4, embed_dim=16
    )
    images, labels = _data()
    variables = model.init(jax.random.PRNGKey(0), images, labels, train=False)
    state = new_train_state(variables)
    step = make_center_loss_train_step(
        model, _prepare, num_classes=4, center_loss_weight=0.1
    )
    raw = {"image": images, "label": labels}
    before = np.asarray(variables["params"]["cls_centroids"]).copy()
    for _ in range(4):
        state, metrics = step(state, raw, 0.05, jax.random.PRNGKey(1))
    after = np.asarray(state.params["cls_centroids"])
    assert not np.allclose(before, after)  # centroids learn
    assert np.isfinite(float(metrics["loss"]))


def test_center_loss_fixed_centroids_frozen():
    fixed = np.eye(4, 16, dtype=np.float32)
    model = CenterLossModel(
        backbone=_backbone(), num_classes=4, embed_dim=16,
        fixed_centroids=fixed,
    )
    images, labels = _data()
    variables = model.init(jax.random.PRNGKey(0), images, labels, train=False)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["cls_centroids"]), fixed
    )
    state = new_train_state(variables)
    step = make_center_loss_train_step(
        model, _prepare, num_classes=4, center_loss_weight=0.1,
        trainable_fn=lambda p: "cls_centroids" not in p,
    )
    raw = {"image": images, "label": labels}
    state, _ = step(state, raw, 0.1, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state.params["cls_centroids"]), fixed
    )
    eval_step = make_center_loss_eval_step(model, _prepare, num_classes=4)
    m = eval_step(state, raw, jax.random.PRNGKey(0))
    assert "pred" in m


def test_center_loss_shape_mismatch_raises():
    model = CenterLossModel(
        backbone=_backbone(), num_classes=4, embed_dim=16,
        fixed_centroids=np.zeros((7, 16), np.float32),
    )
    images, labels = _data()
    with pytest.raises(ValueError, match="does not match"):
        model.init(jax.random.PRNGKey(0), images, labels, train=False)


def test_devise_ranking_loss_values():
    emb = np.eye(3, dtype=np.float32)
    loss = devise_ranking_loss(emb, margin=0.1)
    # Perfect prediction of class 0: true_sim 1, other sims 0.
    y_pred = jnp.asarray([[1.0, 0.0, 0.0]])
    y_true = jnp.asarray([[1.0, 0.0, 0.0]])
    # hinge vs self: relu(0.1 - 1 + 1) = 0.1; vs others: relu(0.1 - 1) = 0
    # sum = 0.1, minus margin -> 0
    assert float(loss(y_true, y_pred)[0]) == pytest.approx(0.0, abs=1e-6)
    # Completely wrong prediction: pred = class 1.
    y_pred = jnp.asarray([[0.0, 1.0, 0.0]])
    # true_sim 0; sims: [0, 1, 0] -> hinges: 0.1, 1.1, 0.1 -> 1.3 - 0.1 = 1.2
    assert float(loss(y_true, y_pred)[0]) == pytest.approx(1.2, abs=1e-6)


def test_adagrad_update_math():
    params = {"w": jnp.array([1.0])}
    accum = {"w": jnp.array([0.0])}
    grads = {"w": jnp.array([2.0])}
    p, a = adagrad_update(params, accum, grads, lr=0.1)
    assert a["w"][0] == pytest.approx(4.0)
    assert p["w"][0] == pytest.approx(1.0 - 0.1 * 2.0 / (2.0 + 1e-7))


def test_eval_steps_fold_l2_penalty_into_val_loss():
    """Keras's evaluate folds model.losses (the L2 kernel penalty) into
    val_loss; --snapshot_best/plateau monitor that total.  All eval-step
    builders must therefore emit total_loss = emb_loss + penalty * count
    when given an l2_penalty_fn (ADVICE r1: labelembed/center/classifier
    eval steps omitted it)."""
    from semantic_embeddings_tpu.train.trainer import make_classifier_eval_step

    images, labels = _data()
    raw = {"image": images, "label": labels}
    penalty = lambda params: jnp.float32(0.125)

    le = LabelEmbedModel(backbone=_backbone(), num_classes=4)
    v = le.init(jax.random.PRNGKey(0), images, labels, train=False)
    st = new_train_state(v)
    base = make_labelembed_eval_step(le, _prepare)(st, raw, jax.random.PRNGKey(0))
    m = make_labelembed_eval_step(le, _prepare, l2_penalty_fn=penalty)(
        st, raw, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m["total_loss"]),
        float(base["emb_loss"]) + 0.125 * float(base["count"]), rtol=1e-6)

    cl = CenterLossModel(backbone=_backbone(), num_classes=4, embed_dim=16)
    v = cl.init(jax.random.PRNGKey(0), images, labels, train=False)
    st = new_train_state(v)
    base = make_center_loss_eval_step(cl, _prepare, num_classes=4)(
        st, raw, jax.random.PRNGKey(0))
    m = make_center_loss_eval_step(
        cl, _prepare, num_classes=4, l2_penalty_fn=penalty)(
        st, raw, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m["total_loss"]),
        float(base["emb_loss"]) + 0.125 * float(base["count"]), rtol=1e-6)

    clf = build_network(4, "simple", classification=True).module
    v = clf.init(jax.random.PRNGKey(0), images, train=False)
    st = new_train_state(v)

    def prep(raw, rng, train):
        return raw["image"], raw["label"]

    base = make_classifier_eval_step(clf, prep, num_classes=4)(
        st, raw, jax.random.PRNGKey(0))
    m = make_classifier_eval_step(
        clf, prep, num_classes=4, l2_penalty_fn=penalty)(
        st, raw, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m["total_loss"]),
        float(base["emb_loss"]) + 0.125 * float(base["count"]), rtol=1e-6)
