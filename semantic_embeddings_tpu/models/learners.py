"""Baseline-learner model heads: label-embedding network and center loss.

Structural parity with ``/root/reference/learn_labelembedding.py:40-56`` and
``learn_center_loss.py:17-41``, re-composed as Flax modules whose auxiliary
inputs (the integer labels) are plain call arguments instead of Keras side
inputs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import KerasBatchNorm, dense, upcast32


def _identity_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.eye(shape[0], shape[1], dtype=dtype)


class LabelEmbedModel(nn.Module):
    """Sun et al. label-embedding network: two classifier heads over the
    embedding (the second fed by a stop-gradient) plus a learnable
    label-embedding matrix initialized to identity."""

    backbone: nn.Module
    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, labels, train: bool = False):
        embedding = self.backbone(x, train=train)
        y = nn.relu(embedding)
        y = KerasBatchNorm(dtype=self.dtype, name="embedding_bn")(y, train)
        out1 = dense(self.num_classes, name="prob_head", dtype=self.dtype)(y)
        out2 = dense(self.num_classes, name="out2", dtype=self.dtype)(
            jax.lax.stop_gradient(y)
        )
        label_embeddings = self.param(
            "labelembeddings", _identity_init,
            (self.num_classes, self.num_classes),
        )
        tar = label_embeddings[labels]
        self.sow("intermediates", "embedding", embedding)
        self.sow("intermediates", "prob", jax.nn.softmax(out1))
        return embedding, out1, out2, tar


class CenterLossModel(nn.Module):
    """Softmax head + (learnable or fixed) class centroids (Wen et al.)."""

    backbone: nn.Module
    num_classes: int
    embed_dim: int
    fixed_centroids: Any = None  # np.ndarray -> frozen semantic centroids
    dtype: Any = None

    @nn.compact
    def __call__(self, x, labels, train: bool = False):
        embedding = self.backbone(x, train=train)
        y = nn.relu(embedding)
        y = KerasBatchNorm(dtype=self.dtype, name="embedding_bn")(y, train)
        y = dense(self.num_classes, name="prob_head", dtype=self.dtype)(y)
        prob = nn.softmax(upcast32(y))

        if self.fixed_centroids is not None:
            fixed = jnp.asarray(self.fixed_centroids, dtype=jnp.float32)
            if fixed.shape != (self.num_classes, self.embed_dim):
                raise ValueError(
                    f"Fixed centroids shape {fixed.shape} does not match "
                    f"({self.num_classes}, {self.embed_dim}); the centroid "
                    "pickle's classes must match the dataset."
                )
            init = lambda key, shape, dtype=jnp.float32: fixed
        else:
            # Keras Embedding default: 'uniform' = RandomUniform(-0.05,
            # 0.05); flax's uniform(scale) is U[0, scale) — wrong mean.
            from .layers import keras_uniform as init
        centroids = self.param(
            "cls_centroids", init, (self.num_classes, self.embed_dim)
        )
        center_dist = jnp.sum(
            jnp.square(embedding - centroids[labels]), axis=-1
        ) / 2.0
        self.sow("intermediates", "embedding", embedding)
        self.sow("intermediates", "prob", prob)
        return embedding, prob, center_dist
