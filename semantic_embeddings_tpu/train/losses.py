"""Embedding and classification losses.

Semantics match the reference loss definitions (``/root/reference/utils.py:
34-122``, ``learn_labelembedding.py:17-37``, ``learn_center_loss.py:17-41``);
all are pure jnp functions over batched arrays, fused by XLA into the
backward pass.  The cosine loss additionally has a Pallas-fused
normalize+dot variant in :mod:`semantic_embeddings_tpu.ops.cosine_loss`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERAS_EPS = 1e-7


def squared_distance(y_true, y_pred):
    """Per-sample squared Euclidean distance (``utils.py:34-36``)."""
    return jnp.sum(jnp.square(y_pred - y_true), axis=-1)


def mean_distance(y_true, y_pred):
    """Per-sample Euclidean distance (``utils.py:39-41``)."""
    return jnp.sqrt(squared_distance(y_true, y_pred))


def inv_correlation(y_true, y_pred):
    """1 - <y_true, y_pred> — THE cosine loss (``utils.py:44-46``),
    applied after L2 normalization of the prediction."""
    return 1.0 - jnp.sum(y_true * y_pred, axis=-1)


def categorical_crossentropy(y_true, probs):
    """Keras-style CE over probabilities (clipped like Keras backend)."""
    probs = jnp.clip(probs, _KERAS_EPS, 1.0 - _KERAS_EPS)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return -jnp.sum(y_true * jnp.log(probs), axis=-1)


def softmax_crossentropy_logits(y_true, logits):
    """Numerically-stable CE from logits (preferred internal path)."""
    return -jnp.sum(y_true * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def devise_ranking_loss(embedding, margin=0.1):
    """Max-margin ranking loss vs. all class embeddings (``utils.py:103-122``).

    Returns a loss fn over (target embedding rows, predicted embeddings).
    """
    embedding = jnp.asarray(embedding, dtype=jnp.float32)

    def loss(y_true, y_pred):
        true_sim = jnp.sum(y_true * y_pred, axis=-1)
        other_sim = y_pred @ embedding.T
        hinge = jax.nn.relu(margin - true_sim[:, None] + other_sim)
        return jnp.sum(hinge, axis=-1) - margin

    return loss


def label_smoothing(onehot, smoothing):
    """Spreads ``smoothing`` mass uniformly over the wrong classes
    (``learn_classifier.py:17-22``)."""
    if smoothing <= 0 or smoothing >= 1:
        return onehot
    n = onehot.shape[-1]
    return onehot * (1.0 - smoothing) + (1.0 - onehot) * (smoothing / (n - 1))


def labelembed_loss(out1, out2, tar, targets, tau=2.0, alpha=0.9, beta=0.5,
                    valid=None):
    """Label-embedding network composite loss (Sun et al.;
    ``learn_labelembedding.py:21-37``).

    ``out1``/``out2`` are the two classifier logit heads, ``tar`` the learned
    label-embedding logits for the true class, ``targets`` integer labels.

    ``valid`` (optional, per-row 0/1): the L_emb_o2 term is *batch-coupled*
    (each row is scaled by ``batch_size / #correct-in-batch``); on a padded
    final eval batch that scale must be computed over the REAL rows only,
    or one real sample inherits a scale dominated by its padding duplicates.
    """
    num_classes = out1.shape[-1]
    onehot = jax.nn.one_hot(targets, num_classes)

    out2_prob = jax.nn.softmax(out2)
    tau2_prob = jax.lax.stop_gradient(jax.nn.softmax(out2 / tau))
    soft_tar = jax.lax.stop_gradient(jax.nn.softmax(tar))

    l_o1_y = softmax_crossentropy_logits(onehot, out1)

    pred = jnp.argmax(out2, axis=-1)
    mask = jax.lax.stop_gradient((pred == targets).astype(out1.dtype))
    if valid is None:
        n_rows = mask.shape[0]
    else:
        v = valid.astype(out1.dtype)
        mask = mask * v
        n_rows = jnp.sum(v)

    def xent(logit, prob):
        return jnp.sum(prob * jax.nn.log_softmax(logit), axis=-1)

    l_o1_emb = -xent(out1, soft_tar)
    l_o2_y = softmax_crossentropy_logits(onehot, out2)
    l_emb_o2 = (
        -xent(tar, tau2_prob)
        * mask
        * (n_rows / (jnp.sum(mask) + 1e-8))
    )
    l_re = jax.nn.relu(jnp.sum(out2_prob * onehot, axis=-1) - alpha)

    return beta * l_o1_y + (1 - beta) * l_o1_emb + l_o2_y + l_emb_o2 + l_re


def center_loss(embeddings, centroids, targets):
    """Half squared distance to the class centroid (Wen et al.;
    ``learn_center_loss.py:35-39``)."""
    return jnp.sum(jnp.square(embeddings - centroids[targets]), axis=-1) / 2.0
