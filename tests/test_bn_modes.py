"""Per-replica (grouped) BatchNorm mode vs the default sync BN.

The reference's only multi-device story is ``keras.utils.multi_gpu_model``
(`/root/reference/learn_image_embeddings.py:133`), whose BN computes
statistics independently per GPU tower.  Our data-parallel default is
global-batch (sync) BN; ``KerasBatchNorm(groups=N)`` /
``--bn_per_replica`` reproduces the per-tower semantics.  These tests pin
the grouped implementation to flax's BatchNorm at groups=1 and run the
PARITY.md falsifier: an A/B on synthetic convergence between the modes.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models.layers import (
    KerasBatchNorm,
    _GroupedBatchNorm,
)


@pytest.fixture
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(1.5, 2.0, (16, 4, 4, 3)).astype(np.float32))


def test_grouped_bn_groups1_matches_flax_batchnorm(x):
    """groups=1 must reproduce nn.BatchNorm bit-for-bit-ish: same
    normalization, same running-stat update, same tree layout."""
    import flax.linen as nn

    ref = KerasBatchNorm(groups=None)  # default: nn.BatchNorm path

    class _Wrap(nn.Module):
        # a top-level module ignores its `name`; nest to get the same
        # BatchNorm_0 layout as KerasBatchNorm
        @nn.compact
        def __call__(self, x, train=False):
            return _GroupedBatchNorm(groups=1, name="BatchNorm_0")(
                x, train=train)

    man = _Wrap()

    v_ref = ref.init(jax.random.PRNGKey(0), x, train=False)
    v_man = jax.tree_util.tree_map(lambda a: a, v_ref)  # same layout

    assert jax.tree_util.tree_structure(
        flax.core.unfreeze(v_ref)) == jax.tree_util.tree_structure(
        flax.core.unfreeze(man.init(jax.random.PRNGKey(0), x, train=False)))

    # train step: outputs and updated running stats must match
    y_ref, mut_ref = ref.apply(v_ref, x, train=True, mutable=["batch_stats"])
    y_man, mut_man = man.apply(v_man, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_man),
                               rtol=0, atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(
                mut_ref["batch_stats"])[0 if k == "mean" else 1]),
            np.asarray(jax.tree_util.tree_leaves(
                mut_man["batch_stats"])[0 if k == "mean" else 1]),
            rtol=0, atol=1e-6, err_msg=k)

    # inference: running-average path must match
    y_ref = ref.apply(v_ref, x, train=False)
    y_man = man.apply(v_man, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_man),
                               rtol=0, atol=2e-6)


def test_grouped_bn_equals_per_shard_bn(x):
    """groups=4 must equal running a separate sync BN on each quarter of
    the batch (the definition of per-tower statistics)."""
    grp = KerasBatchNorm(groups=4)
    v = grp.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = grp.apply(v, x, train=True, mutable=["batch_stats"])

    solo = KerasBatchNorm(groups=None)
    vs = solo.init(jax.random.PRNGKey(0), x[:4], train=False)
    for g in range(4):
        xg = x[4 * g: 4 * g + 4]
        yg, _ = solo.apply(vs, xg, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y[4 * g: 4 * g + 4]), np.asarray(yg),
            rtol=0, atol=2e-6, err_msg=f"group {g}")


def test_grouped_bn_running_stats_are_whole_batch_moments(x):
    """Running statistics aggregate the whole batch (law of total
    variance), so inference matches sync-BN inference regardless of mode."""
    grp = _GroupedBatchNorm(groups=4, momentum=0.0)
    v = grp.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = grp.apply(v, x, train=True, mutable=["batch_stats"])
    stats = mut["batch_stats"]
    xf = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               xf.mean((0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               xf.var((0, 1, 2)), rtol=1e-5)


def test_bn_mode_ab_convergence():
    """PARITY.md falsifier: per-replica BN (8 groups, i.e. per-shard stats
    at batch 32 on the 8-device mesh) vs sync BN on the same synthetic
    task.  The assumption under test: switching BN modes does not change
    convergence materially at the reference's per-tower batch sizes
    (>= 12 samples/tower in every published recipe; here 4/tower)."""
    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network
    from semantic_embeddings_tpu.train import (
        make_eval_step,
        make_train_step,
        new_train_state,
        run_validation,
    )

    embedding = np.eye(8, dtype=np.float32)

    def run(groups):
        from semantic_embeddings_tpu.models import layers as L

        old = L.DEFAULT_BN_GROUPS
        L.set_default_bn_groups(groups)
        try:
            dataset = SyntheticDataset(
                num_classes=8, n_train=64, n_test=32, size=8)
            spec = build_network(8, "simple")
            model = EmbeddingModel(backbone=spec.module, output="l2norm")
            variables = jax.jit(
                lambda k: model.init(
                    k, jnp.zeros((2, 8, 8, 3)), train=False)
            )(jax.random.PRNGKey(0))
            state = new_train_state(variables)
            prepare = dataset.make_prepare(augment_train=False)
            step = make_train_step(
                model, prepare, loss_name="inv_corr",
                class_embedding=embedding, l2_penalty_fn=spec.l2_penalty,
            )
            first = last = None
            for epoch in range(6):
                for raw in dataset.train_batches(32, epoch, 0):
                    rng = jax.random.fold_in(jax.random.PRNGKey(0), epoch)
                    state, m = step(state, raw, 0.05, rng)
                    last = float(m["emb_loss"])
                    if first is None:
                        first = last
            return first, last
        finally:
            L.set_default_bn_groups(old)

    # Training (not validation) loss: BN running stats with momentum 0.99
    # barely move in 12 steps, so val metrics sit at chance for ANY mode
    # on runs this short — not what's under test.
    first_sync, last_sync = run(1)
    first_two, last_two = run(2)    # the reference's --gpus 2: 16/tower
    first_eight, last_eight = run(8)  # harsh case: 4 samples/tower
    assert last_sync < 0.5 * first_sync, (first_sync, last_sync)
    assert last_two < 0.5 * first_two, (first_two, last_two)
    assert last_eight < 0.5 * first_eight, (first_eight, last_eight)
    # The falsifier proper, at the reference's actual per-tower batch
    # share (--gpus 2 on every published multi-GPU recipe): the modes
    # must converge alike.  MEASURED (PARITY.md §BN): at 16/tower the
    # final losses agree; at an unrepresentative 4/tower the per-tower
    # run converges measurably slower (0.26 vs 0.065 after 12 steps) —
    # the expected small-statistics degradation, not a parity breaker.
    assert abs(last_sync - last_two) < 0.25 * max(last_sync, last_two) + 0.05, (
        last_sync, last_two)


def test_multi_gpu_bn_note(capsys):
    """--gpus > 1 without --bn_per_replica prints the sync-BN divergence
    note (VERDICT r3 #6: silently different BN semantics than the
    reference's per-tower multi_gpu_model); with the flag it prints the
    per-replica line instead."""
    from semantic_embeddings_tpu.cli.common import resolve_mesh
    from semantic_embeddings_tpu.models import layers as L

    old = L.DEFAULT_BN_GROUPS
    try:
        assert resolve_mesh(2) is not None
        out = capsys.readouterr().out
        assert "--bn_per_replica" in out and "per tower" in out

        assert resolve_mesh(1) is None
        assert "--bn_per_replica" not in capsys.readouterr().out

        assert resolve_mesh(2, bn_per_replica=True) is not None
        out = capsys.readouterr().out
        assert "per-replica statistics over 2 shards" in out
        assert "NOTE:" not in out
    finally:
        L.set_default_bn_groups(old)
