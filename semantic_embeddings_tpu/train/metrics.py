"""Training-time metrics: embedding-space nearest-neighbor accuracy, top-k.

Semantics follow ``/root/reference/utils.py:49-100``: a prediction is
correct when the nearest class embedding (min Euclidean distance or max dot
product) is the target's.  The reference detects this by comparing the best
distance against the recomputed target distance within 1e-6 — which breaks
on TPU where the class-similarity matmul and the per-sample reduction round
differently.  Here the target's *index* is recovered by nearest-embedding
lookup of the target vector itself (exact, since it is a row of the class
matrix), making the comparison tolerance-free; ties resolve by argmax order
instead of counting as correct.
"""

from __future__ import annotations

import jax.numpy as jnp


def nn_accuracy(embedding, dot_prod_sim=False, k=1):
    """Per-sample accuracy of nearest-class-embedding classification.

    ``embedding``: (n_classes, d) class embedding matrix.
    ``dot_prod_sim``: use max dot product (assumes normalized embeddings)
    instead of min Euclidean distance.
    """
    embedding = jnp.asarray(embedding, dtype=jnp.float32)
    cent_norm = jnp.sum(jnp.square(embedding), axis=1)

    def scores(y):
        """Higher = closer, shape (B, n_classes)."""
        sim = y @ embedding.T
        if dot_prod_sim:
            return sim
        return 2.0 * sim - cent_norm[None, :]  # = -(dist^2) + const(y)

    def metric(y_true, y_pred):
        s_pred = scores(y_pred.astype(jnp.float32))
        # The target is an exact row of `embedding`; its nearest class
        # under the same scoring recovers its index.
        label_idx = jnp.argmax(scores(y_true.astype(jnp.float32)), axis=-1)
        if k <= 1:
            return (jnp.argmax(s_pred, axis=-1) == label_idx).astype(
                jnp.float32
            )
        topk = jnp.argsort(-s_pred, axis=-1)[:, :k]
        return jnp.any(topk == label_idx[:, None], axis=-1).astype(jnp.float32)

    return metric


def top_k_categorical_accuracy(y_true_onehot, probs, k=5):
    """Keras ``top_k_categorical_accuracy`` (``utils.py:49-54``)."""
    true_idx = jnp.argmax(y_true_onehot, axis=-1)
    topk = jnp.argsort(-probs, axis=-1)[:, :k]
    return jnp.any(topk == true_idx[:, None], axis=-1).astype(jnp.float32)


def categorical_accuracy(y_true_onehot, probs):
    return (
        jnp.argmax(probs, axis=-1) == jnp.argmax(y_true_onehot, axis=-1)
    ).astype(jnp.float32)


def balanced_accuracy(y_pred, y_true, num_classes=None):
    """Class-frequency-weighted ("Average") accuracy, reference-exact
    (``learn_image_embeddings.py:252-255``): the denominator is
    ``len(np.bincount(y_true))`` = max test label + 1 — NOT the number of
    classes present, and NOT ``num_classes`` (kept for signature compat;
    the reference's bincount has no minlength)."""
    import numpy as np

    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    freq = np.bincount(y_true)
    correct = (y_pred == y_true).astype(np.float64)
    return (correct / freq[y_true]).sum() / len(freq)
