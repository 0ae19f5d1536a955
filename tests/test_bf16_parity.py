"""bf16-compute falsifier (PARITY.md "Assumed links"): training with
bfloat16 activations/matmuls (master weights in f32, `--bf16`) must
converge like f32 on the same task, and the two loss trajectories must
start out numerically close (same math, lower precision).

The reference trains f32 only; the bench headline here uses bf16 — this
pins the assumption that the switch is accuracy-neutral.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _run(dtype, epochs=6):
    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    embedding = np.eye(8, dtype=np.float32)
    dataset = SyntheticDataset(num_classes=8, n_train=64, n_test=32, size=8)
    spec = build_network(8, "simple", dtype=dtype)
    model = EmbeddingModel(backbone=spec.module, output="l2norm",
                           dtype=dtype)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((2, 8, 8, 3)), train=False)
    )(jax.random.PRNGKey(0))
    # master weights are f32 in BOTH modes (only activations/matmuls differ)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    state = new_train_state(variables)
    prepare = dataset.make_prepare(augment_train=False)
    step = make_train_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
        l2_penalty_fn=spec.l2_penalty,
    )
    losses = []
    for epoch in range(epochs):
        for raw in dataset.train_batches(32, epoch, 0):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), epoch)
            state, m = step(state, raw, 0.05, rng)
            losses.append(float(m["emb_loss"]))
    return losses


def test_bf16_convergence_matches_f32():
    f32 = _run(None)
    bf16 = _run(jnp.bfloat16)
    # Same initialization, same data order: the first step's loss is the
    # same computation at two precisions.
    assert abs(f32[0] - bf16[0]) < 0.02 * abs(f32[0]) + 1e-3, (f32[0], bf16[0])
    # Both converge (loss more than halves) ...
    assert f32[-1] < 0.5 * f32[0], f32
    assert bf16[-1] < 0.5 * bf16[0], bf16
    # ... to comparable final losses: precision changes rounding, not the
    # optimization outcome.
    assert abs(f32[-1] - bf16[-1]) < 0.25 * max(f32[-1], bf16[-1]) + 0.05, (
        f32[-1], bf16[-1])
