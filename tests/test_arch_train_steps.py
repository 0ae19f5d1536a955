"""One gradient step through a small variant of every architecture family
(SURVEY §4.2: per-architecture integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models import (
    DenseNet,
    EmbeddingModel,
    PlainNet,
    PyramidNet,
    SmallResNet,
    WideResNet,
)
from semantic_embeddings_tpu.models.resnet import ResNet
from semantic_embeddings_tpu.train import make_train_step, new_train_state

FAMILIES = [
    PlainNet(output_dim=8, filters=(8, "ap", 8, "gap", "fc8")),
    SmallResNet(n=1, filters=(8, 8, 8), classes=8, top_activation=None),
    PyramidNet(depth=11, alpha=9, bottleneck=True, classes=8,
               top_activation=None),
    WideResNet(classes=8, n_blocks=1, width=1, final_activation=None),
    DenseNet(classes=8, depth=7, growth_rate=4, bottleneck=False,
             nb_filter=8, top_activation=None),
]


@pytest.mark.parametrize("backbone", FAMILIES, ids=lambda m: type(m).__name__)
def test_one_gradient_step(backbone):
    emb = np.eye(8, dtype=np.float32)
    model = EmbeddingModel(backbone=backbone, output="l2norm")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
    )
    labels = jnp.asarray(np.arange(4, dtype=np.int32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = new_train_state(variables)
    step = make_train_step(
        model, lambda raw, rng, train: (raw["image"], raw["label"]),
        loss_name="inv_corr", class_embedding=emb, clipnorm=10.0,
    )
    new_state, metrics = step(
        state, {"image": x, "label": labels}, 0.01, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # parameters moved
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(new_state.params)
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_nasnet_gradient_step():
    from semantic_embeddings_tpu.models.nasnet import NASNetA

    backbone = NASNetA(classes=8, num_normal_cells=1,
                       penultimate_filters=24 * 8, stem_filters=8,
                       top_activation=None)
    emb = np.eye(8, dtype=np.float32)
    model = EmbeddingModel(backbone=backbone, output="l2norm")
    x = jnp.ones((2, 64, 64, 3))
    labels = jnp.asarray([0, 1], dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = new_train_state(variables)
    step = make_train_step(
        model, lambda raw, rng, train: (raw["image"], raw["label"]),
        loss_name="inv_corr", class_embedding=emb,
    )
    _, metrics = step(
        state, {"image": x, "label": labels}, 0.01, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
