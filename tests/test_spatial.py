"""Spatial partitioning: image-height sharding over a (data, spatial) mesh.

Beyond-parity TPU feature (the reference's ``multi_gpu_model`` only splits
the batch axis): the conv stack is partitioned along H via GSPMD — XLA
inserts the halo exchanges for 3x3 convs and pools, and the BatchNorm /
global-pool reductions become cross-shard collectives automatically.  The
contract under test is numerical equality with the single-device step.
"""

import jax
import numpy as np
import pytest

from semantic_embeddings_tpu.data import SyntheticDataset
from semantic_embeddings_tpu.models import EmbeddingModel, build_network
from semantic_embeddings_tpu.parallel import (
    SPATIAL_AXIS,
    get_mesh,
    image_sharding,
    replicate,
    shard_batch,
    spatial_size,
)
from semantic_embeddings_tpu.train import (
    make_eval_step,
    make_train_step,
    new_train_state,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    embedding = np.eye(8, dtype=np.float32)
    dataset = SyntheticDataset(num_classes=8, n_train=64, n_test=32, size=16)
    spec = build_network(8, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    import jax.numpy as jnp

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((2, 16, 16, 3)), train=False)
    )(jax.random.PRNGKey(0))
    return embedding, dataset, spec, model, variables


def test_get_mesh_spatial_shape():
    mesh = get_mesh(8, spatial=4)
    assert mesh.axis_names == ("data", "spatial")
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    assert spatial_size(mesh) == 4
    assert spatial_size(get_mesh(8)) == 1
    assert spatial_size(None) == 1
    with pytest.raises(ValueError, match="multiple of spatial"):
        get_mesh(8, spatial=3)


def _run_step(setup, mesh):
    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare(augment_train=False)
    kwargs = dict(
        loss_name="inv_corr", class_embedding=embedding,
        l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
    )
    raw = next(iter(dataset.train_batches(32, 0, 0)))
    rng = jax.random.PRNGKey(3)
    state = new_train_state(variables)
    if mesh is not None:
        state = replicate(mesh, state)
        raw = shard_batch(mesh, raw)
    step = make_train_step(model, prepare, mesh=mesh, **kwargs)
    state, m = step(state, raw, 0.1, rng)
    return state, m


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 4)])
def test_spatial_step_matches_single_device(setup, shape):
    """(data x spatial) sharded train step == single-device step.  The
    (1, 4) case is PURE spatial partitioning: one image batch split only
    along H — the use-case where the recipe's per-chip-optimal batch
    cannot grow (448 px, batch 24; SPEED.md)."""
    data, spatial = shape
    state1, m1 = _run_step(setup, None)
    mesh = get_mesh(data * spatial, spatial=spatial)
    state2, m2 = _run_step(setup, mesh)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # 2e-4: f32 reduction-order drift — BN statistics and gradient sums
    # reassociate differently per mesh grid, and the per-tensor clipnorm
    # amplifies a tiny norm difference into every element of the tensor
    # (measured max 6.3e-5 on the (4,2) grid; (2,4)/(1,4) stay under 1e-5).
    # A real partitioning bug (wrong halo, missed collective) shows up at
    # O(1e-2), far above this tolerance.
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # BatchNorm running stats must also agree (their batch reductions are
    # cross-shard collectives under the spatial mesh).
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.batch_stats),
        jax.tree_util.tree_leaves(state2.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_spatial_eval_step(setup):
    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare()
    mesh = get_mesh(8, spatial=4)
    state = replicate(mesh, new_train_state(variables))
    eval_step = make_eval_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
        mesh=mesh,
    )
    raw = next(iter(dataset.test_batches(32)))
    metrics = eval_step(state, shard_batch(mesh, raw), jax.random.PRNGKey(0))
    assert float(metrics["count"]) == 32.0

    # must equal the unsharded eval metrics
    eval1 = make_eval_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
    )
    m1 = eval1(new_train_state(variables),
               next(iter(dataset.test_batches(32))), jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m1["emb_loss"]), float(metrics["emb_loss"]), rtol=1e-5)


def test_spatial_step_with_augmentation(setup):
    """On-device augmentation (affine gathers along the sharded H axis)
    must compile and stay numerically equal under the spatial mesh —
    GSPMD turns the cross-shard gathers into collectives."""
    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare(augment_train=True)
    kwargs = dict(loss_name="inv_corr", class_embedding=embedding,
                  clipnorm=10.0)
    raw = next(iter(dataset.train_batches(16, 0, 0)))
    rng = jax.random.PRNGKey(7)

    state1 = new_train_state(variables)
    step1 = make_train_step(model, prepare, **kwargs)
    state1, m1 = step1(state1, raw, 0.1, rng)

    mesh = get_mesh(8, spatial=2)
    state2 = replicate(mesh, new_train_state(variables))
    step2 = make_train_step(model, prepare, mesh=mesh, **kwargs)
    state2, m2 = step2(state2, shard_batch(mesh, raw), 0.1, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_shard_batch_images_get_spatial_sharding(setup):
    """Rank-4 NHWC leaves are placed with (data, spatial) sharding when H
    divides; other leaves shard on data only."""
    mesh = get_mesh(8, spatial=4)
    batch = {
        "img": np.zeros((16, 16, 16, 3), np.float32),
        "odd_h": np.zeros((16, 15, 16, 3), np.float32),  # 15 % 4 != 0
        "idx": np.arange(16, dtype=np.int32),
    }
    out = shard_batch(mesh, batch)
    assert out["img"].sharding == image_sharding(mesh)
    assert out["odd_h"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert out["idx"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_spatial_fit_matches_single_device(setup):
    """The full fit() loop under a (2, 4) mesh reproduces the
    single-device parameters and metrics."""
    from semantic_embeddings_tpu.train.schedules import PiecewiseSchedule
    from semantic_embeddings_tpu.train.trainer import fit

    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare(augment_train=False)
    kwargs = dict(loss_name="inv_corr", class_embedding=embedding,
                  l2_penalty_fn=spec.l2_penalty, clipnorm=10.0)

    def run(mesh):
        state = new_train_state(variables)
        train_step = make_train_step(model, prepare, mesh=mesh, **kwargs)
        eval_step = make_eval_step(model, prepare, mesh=mesh,
                                   loss_name="inv_corr",
                                   class_embedding=embedding)
        logged = []
        state = fit(
            state, train_step, eval_step, dataset,
            PiecewiseSchedule([(0, 0.1)]), epochs=2, batch_size=32,
            verbose=False, mesh=mesh,
            log_fn=lambda e, m: logged.append(m),
        )
        return state, logged

    state1, logged1 = run(None)
    state2, logged2 = run(get_mesh(8, spatial=4))
    # 2 epochs x 2 steps compound the per-step f32 reduction-order drift
    # (see test_spatial_step_matches_single_device); single-step equality
    # is pinned at 3e-5 there.
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for m1, m2 in zip(logged1, logged2):
        for k in m1:
            assert m1[k] == pytest.approx(m2[k], abs=3e-4), k


def test_classifier_step_spatial(setup):
    """learn_classifier's step builders honor the spatial mesh too."""
    from semantic_embeddings_tpu.train.trainer import (
        make_classifier_eval_step,
        make_classifier_train_step,
    )

    embedding, dataset, spec, model, variables = setup
    del model  # classifier uses the backbone's classification head
    cls_spec = build_network(8, "simple", classification=True)
    import jax.numpy as jnp

    cls_model = cls_spec.module
    cls_vars = jax.jit(
        lambda k: cls_model.init(k, jnp.zeros((2, 16, 16, 3)), train=False)
    )(jax.random.PRNGKey(0))
    prepare = dataset.make_prepare(augment_train=False)
    raw = next(iter(dataset.train_batches(16, 0, 0)))
    rng = jax.random.PRNGKey(1)

    state1 = new_train_state(cls_vars)
    step1 = make_classifier_train_step(cls_model, prepare, num_classes=8)
    state1, m1 = step1(state1, raw, 0.1, rng)

    mesh = get_mesh(8, spatial=2)
    state2 = replicate(mesh, new_train_state(cls_vars))
    step2 = make_classifier_train_step(
        cls_model, prepare, num_classes=8, mesh=mesh)
    state2, m2 = step2(state2, shard_batch(mesh, raw), 0.1, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)

    ev = make_classifier_eval_step(cls_model, prepare, num_classes=8,
                                   mesh=mesh)
    metrics = ev(state2, shard_batch(mesh, next(iter(dataset.test_batches(16)))),
                 rng)
    assert float(metrics["count"]) == 16.0


def test_spatial_bf16_remat_step(setup):
    """Production flags compose: --bf16 + --remat + --spatial. One step on
    a (2, 4) mesh with a rematerialized bf16 resnet must run and produce a
    finite loss close to the single-device bf16 value."""
    import jax.numpy as jnp

    embedding, dataset, spec, _, _ = setup
    rspec = build_network(8, "resnet-110-fc", dtype=jnp.bfloat16, remat=True)
    rspec.module = rspec.module.clone(n=1)
    model = EmbeddingModel(backbone=rspec.module, output="l2norm",
                           dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((2, 16, 16, 3)), train=False)
    )(jax.random.PRNGKey(0))
    prepare = dataset.make_prepare(augment_train=False)
    kwargs = dict(loss_name="inv_corr", class_embedding=embedding,
                  l2_penalty_fn=rspec.l2_penalty, clipnorm=10.0)
    raw = next(iter(dataset.train_batches(16, 0, 0)))
    rng = jax.random.PRNGKey(5)

    state1 = new_train_state(variables)
    step1 = make_train_step(model, prepare, **kwargs)
    _, m1 = step1(state1, raw, 0.1, rng)

    mesh = get_mesh(8, spatial=4)
    state2 = replicate(mesh, new_train_state(variables))
    step2 = make_train_step(model, prepare, mesh=mesh, **kwargs)
    _, m2 = step2(state2, shard_batch(mesh, raw), 0.1, rng)

    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l2)
    # bf16 compute reassociated across shards: loose but meaningful bound
    np.testing.assert_allclose(l1, l2, rtol=1e-2)
