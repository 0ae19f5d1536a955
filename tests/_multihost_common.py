"""Deterministic train recipe shared by the two-process multi-host test
(`test_multihost.py`) and its in-process single-host baseline.

Every input is seeded so two processes (and the baseline) generate byte-
identical global batches; the multi-host run exercises
``parallel.shard_batch``'s ``make_array_from_process_local_data`` branch
end-to-end (each process feeds its contiguous local slice of the global
batch, `parallel/mesh.py:103-121`).
"""

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def run_fit(mesh, epochs=2):
    """Runs the canonical toy fit on ``mesh`` (None: single device)
    and returns (flat params dict, list of per-epoch metric dicts)."""
    import os

    epochs = int(os.environ.get("MH_EPOCHS", epochs))
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import (
        make_eval_step,
        make_train_step,
        new_train_state,
    )
    from semantic_embeddings_tpu.train.schedules import PiecewiseSchedule
    from semantic_embeddings_tpu.train.trainer import fit

    embedding = np.eye(8, dtype=np.float32)
    dataset = SyntheticDataset(num_classes=8, n_train=64, n_test=32, size=8)
    spec = build_network(8, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((2, 8, 8, 3)), train=False)
    )(jax.random.PRNGKey(0))
    prepare = dataset.make_prepare(augment_train=False)
    kwargs = dict(
        loss_name="inv_corr", class_embedding=embedding,
        l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
    )
    state = new_train_state(variables)
    train_step = make_train_step(model, prepare, mesh=mesh, **kwargs)
    eval_step = make_eval_step(
        model, prepare, mesh=mesh, loss_name="inv_corr",
        class_embedding=embedding,
    )
    logged = []
    state = fit(
        state, train_step, eval_step, dataset,
        # lr 0.02: the cross-process program's f32 reduction order differs
        # from the single-process one by ~2.6e-7 per step (measured); a hot
        # lr amplifies that chaotically through BN+momentum, which would
        # test amplification, not parity.
        PiecewiseSchedule([(0, 0.02)]), epochs=epochs, batch_size=32,
        verbose=False, mesh=mesh, log_fn=lambda e, m: logged.append(m),
    )
    import flax

    return _flatten(flax.core.unfreeze(state.params)), logged
