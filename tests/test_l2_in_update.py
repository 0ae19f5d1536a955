"""L2-as-gradient must produce identical updates to the loss-side penalty."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_embeddings_tpu.models import EmbeddingModel, build_network
from semantic_embeddings_tpu.train import make_train_step, new_train_state
from semantic_embeddings_tpu.train.optimizer import l2_coef_tree


def test_l2_gradient_equals_loss_penalty():
    emb = np.eye(4, dtype=np.float32)
    spec = build_network(4, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 16, 16, 3)).astype(np.float32)
    )
    labels = jnp.asarray(np.arange(4, dtype=np.int32))
    raw = {"image": x, "label": labels}
    prepare = lambda r, k, t: (r["image"], r["label"])
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    step_loss = make_train_step(
        model, prepare, loss_name="inv_corr", class_embedding=emb,
        l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
    )
    coefs = l2_coef_tree(variables["params"], spec.l2_filters)
    step_grad = make_train_step(
        model, prepare, loss_name="inv_corr", class_embedding=emb,
        l2_coef_tree=coefs, clipnorm=10.0,
    )

    s1, m1 = step_loss(new_train_state(variables), raw, 0.1, jax.random.PRNGKey(1))
    s2, m2 = step_grad(new_train_state(variables), raw, 0.1, jax.random.PRNGKey(1))
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # emb_loss identical; 'loss' differs by the penalty term (documented).
    assert float(m1["emb_loss"]) == float(m2["emb_loss"])


def test_coef_tree_matches_filters():
    spec = build_network(4, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    coefs = l2_coef_tree(variables["params"], spec.l2_filters)
    flat = jax.tree_util.tree_flatten_with_path(coefs)[0]
    by_path = {
        "/".join(str(getattr(p, "key", p)) for p in path): c for path, c in flat
    }
    assert by_path["backbone/conv1/kernel"] == 5e-4
    assert by_path["backbone/top/kernel"] == 0.0     # excluded for plainnet
    assert by_path["backbone/conv1/bias"] == 0.0     # biases unregularized
