"""Training-time metrics: embedding-space nearest-neighbor accuracy, top-k.

Semantics match ``/root/reference/utils.py:49-100``: a prediction counts as
correct when its distance (or dot-product similarity) to the *target* class
embedding is within 1e-6 of the best over all class embeddings.
"""

from __future__ import annotations

import jax.numpy as jnp

_TOL = 1e-6


def nn_accuracy(embedding, dot_prod_sim=False, k=1):
    """Per-sample accuracy of nearest-class-embedding classification.

    ``embedding``: (n_classes, d) class embedding matrix.
    ``dot_prod_sim``: use max dot product (assumes normalized embeddings)
    instead of min Euclidean distance.
    """
    embedding = jnp.asarray(embedding, dtype=jnp.float32)

    def euclidean(y_true, y_pred):
        cent_norm = jnp.sum(jnp.square(embedding), axis=1)
        dist = (
            jnp.sum(jnp.square(y_pred), axis=1, keepdims=True)
            + cent_norm[None, :]
            - 2.0 * (y_pred @ embedding.T)
        )
        true_dist = jnp.sum(jnp.square(y_pred - y_true), axis=-1)
        if k <= 1:
            return (jnp.abs(true_dist - jnp.min(dist, axis=-1)) < _TOL).astype(
                jnp.float32
            )
        kth = jnp.sort(dist, axis=-1)[:, :k]  # k smallest distances
        return jnp.any(jnp.abs(kth - true_dist[:, None]) < _TOL, axis=-1).astype(
            jnp.float32
        )

    def dot_product(y_true, y_pred):
        sim = y_pred @ embedding.T
        true_sim = jnp.sum(y_pred * y_true, axis=-1)
        if k <= 1:
            return (jnp.abs(jnp.max(sim, axis=-1) - true_sim) < _TOL).astype(
                jnp.float32
            )
        topk = -jnp.sort(-sim, axis=-1)[:, :k]
        return jnp.any(jnp.abs(topk - true_sim[:, None]) < _TOL, axis=-1).astype(
            jnp.float32
        )

    return dot_product if dot_prod_sim else euclidean


def top_k_categorical_accuracy(y_true_onehot, probs, k=5):
    """Keras ``top_k_categorical_accuracy`` (``utils.py:49-54``)."""
    true_idx = jnp.argmax(y_true_onehot, axis=-1)
    topk = jnp.argsort(-probs, axis=-1)[:, :k]
    return jnp.any(topk == true_idx[:, None], axis=-1).astype(jnp.float32)


def categorical_accuracy(y_true_onehot, probs):
    return (
        jnp.argmax(probs, axis=-1) == jnp.argmax(y_true_onehot, axis=-1)
    ).astype(jnp.float32)


def balanced_accuracy(y_pred, y_true, num_classes):
    """Class-frequency-weighted ("Average") accuracy
    (``learn_image_embeddings.py:252-255``)."""
    import numpy as np

    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    freq = np.bincount(y_true, minlength=num_classes)
    correct = (y_pred == y_true).astype(np.float64)
    return (correct / freq[y_true]).sum() / (freq > 0).sum()
