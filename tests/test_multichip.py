"""Multi-chip data-parallel path on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from semantic_embeddings_tpu.data import SyntheticDataset
from semantic_embeddings_tpu.models import EmbeddingModel, build_network
from semantic_embeddings_tpu.parallel import (
    get_mesh,
    replicate,
    shard_batch,
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
    dataset = SyntheticDataset(num_classes=8, n_train=64, n_test=32, size=8)
    spec = build_network(8, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    import jax.numpy as jnp

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((2, 8, 8, 3)), train=False)
    )(jax.random.PRNGKey(0))
    return embedding, dataset, spec, model, variables


def test_sharded_step_matches_single_device(setup):
    """The pjit-sharded train step must be numerically equal to the
    single-device step (SURVEY.md §4.3)."""
    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare(augment_train=False)
    kwargs = dict(
        loss_name="inv_corr", class_embedding=embedding,
        l2_penalty_fn=spec.l2_penalty, clipnorm=10.0,
    )
    raw = next(iter(dataset.train_batches(32, 0, 0)))
    rng = jax.random.PRNGKey(3)

    # Single device.
    state1 = new_train_state(variables)
    step1 = make_train_step(model, prepare, **kwargs)
    state1, m1 = step1(state1, raw, 0.1, rng)

    # 8-device mesh.
    mesh = get_mesh(8)
    state8 = replicate(mesh, new_train_state(variables))
    step8 = make_train_step(model, prepare, mesh=mesh, **kwargs)
    state8, m8 = step8(state8, shard_batch(mesh, raw), 0.1, rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state8.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_sharded(setup):
    embedding, dataset, spec, model, variables = setup
    prepare = dataset.make_prepare()
    mesh = get_mesh(8)
    state = replicate(mesh, new_train_state(variables))
    eval_step = make_eval_step(
        model, prepare, loss_name="inv_corr", class_embedding=embedding,
        mesh=mesh,
    )
    raw = next(iter(dataset.test_batches(32)))
    metrics = eval_step(state, shard_batch(mesh, raw), jax.random.PRNGKey(0))
    assert float(metrics["count"]) == 32.0


def test_sharded_retrieval_matches_single(setup):
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy(
        {"a": ["r"], "b": ["r"], "c": ["s"], "d": ["s"], "r": ["t"], "s": ["t"]},
        {"t": ["r", "s"], "r": ["a", "b"], "s": ["c", "d"]},
    )
    rng = np.random.default_rng(5)
    labels = [["a", "b", "c", "d"][i % 4] for i in range(60)]
    feats = rng.normal(size=(60, 8)).astype(np.float32)
    single, _ = evaluate_retrieval_features(
        feats, labels, h, ks=[1, 5], normalize=True, block_size=17
    )
    mesh = get_mesh(8)
    sharded, _ = evaluate_retrieval_features(
        feats, labels, h, ks=[1, 5], normalize=True, block_size=17, mesh=mesh
    )
    for name in single:
        assert single[name] == pytest.approx(sharded[name], abs=1e-6), name


def test_graft_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_fit_under_mesh_matches_single_device(setup):
    """The full fit() loop (incl. the device-side epoch-metric accumulator
    and snapshotting path) must give the same parameters and epoch-mean
    metrics sharded as on one device."""
    from semantic_embeddings_tpu.train import make_eval_step, make_train_step
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
    state8, logged8 = run(get_mesh(8))
    # 2 epochs x 2 steps accumulate f32 reduction-order drift (sharded
    # psum order); the single-STEP equality test above pins 1e-5.
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state8.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    for m1, m8 in zip(logged1, logged8):
        for k in m1:
            assert m1[k] == pytest.approx(m8[k], abs=1e-4), k


def test_sharded_topk_retrieval_matches_single(setup):
    """The top_k prefix fast path under a mesh (sharded query blocks) must
    match single-device results."""
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy(
        {"a": ["r"], "b": ["r"], "c": ["s"], "d": ["s"], "r": ["t"], "s": ["t"]},
        {"t": ["r", "s"], "r": ["a", "b"], "s": ["c", "d"]},
    )
    rng = np.random.default_rng(7)
    labels = [["a", "b", "c", "d"][i % 4] for i in range(64)]
    feats = rng.normal(size=(64, 8)).astype(np.float32)
    kwargs = dict(ks=[1, 5], compute_ahp=12, compute_ap=False,
                  normalize=True, block_size=16)
    single, _ = evaluate_retrieval_features(feats, labels, h, **kwargs)
    sharded, _ = evaluate_retrieval_features(
        feats, labels, h, mesh=get_mesh(8), **kwargs
    )
    assert "AHP@12 (WUP)" in single
    for name in single:
        assert single[name] == pytest.approx(sharded[name], abs=1e-6), name


def test_process_slice_math():
    """Multi-host batch slicing is pure math (unit-testable without a
    multi-process run): contiguous equal slices in process order."""
    from semantic_embeddings_tpu.parallel import process_slice

    slices = [process_slice(256, i, 4) for i in range(4)]
    assert slices == [(0, 64), (64, 128), (128, 192), (192, 256)]
    assert process_slice(8, 0, 1) == (0, 8)
    with pytest.raises(ValueError, match="not divisible"):
        process_slice(10, 0, 4)


def test_initialize_distributed_is_noop_single_process():
    from semantic_embeddings_tpu.parallel import initialize_distributed

    initialize_distributed()  # must not raise or try to reach a coordinator
    assert jax.process_count() == 1


def test_shard_batch_single_process_unchanged(setup):
    """With one process, shard_batch must behave exactly as before
    (device_put path), including replicating scalars."""
    from semantic_embeddings_tpu.parallel import shard_batch as sb

    mesh = get_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(32, 1),
             "s": np.float32(3.0)}
    out = sb(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert float(out["s"]) == 3.0
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_db_sharded_retrieval_matches_replicated(setup):
    """Database-sharded mode (per-chip exact top-k + cross-chip candidate
    merge, O(N/n_dev) database memory) must produce identical metrics to
    the replicated-database path (SURVEY §5.7 "stream database blocks")."""
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy(
        {"a": ["r"], "b": ["r"], "c": ["s"], "d": ["s"], "r": ["t"], "s": ["t"]},
        {"t": ["r", "s"], "r": ["a", "b"], "s": ["c", "d"]},
    )
    rng = np.random.default_rng(11)
    labels = [["a", "b", "c", "d"][i % 4] for i in range(61)]  # odd N: padding
    feats = rng.normal(size=(61, 8)).astype(np.float32)
    # duplicate rows force value ties across different database shards —
    # the merge's tie order must still match the replicated ranking
    feats[7] = feats[3]
    feats[45] = feats[3]
    kwargs = dict(ks=[1, 5], compute_ahp=12, compute_ap=False,
                  normalize=True, block_size=16)
    mesh = get_mesh(8)
    replicated_means, replicated_pq = evaluate_retrieval_features(
        feats, labels, h, mesh=mesh, **kwargs)
    sharded_means, sharded_pq = evaluate_retrieval_features(
        feats, labels, h, mesh=mesh, db_sharded=True, **kwargs)
    for name in replicated_means:
        assert sharded_means[name] == pytest.approx(
            replicated_means[name], abs=1e-6), name
        for q in replicated_pq[name]:
            assert sharded_pq[name][q] == pytest.approx(
                replicated_pq[name][q], abs=1e-6), (name, q)


def test_db_sharded_requires_topk_protocol(setup):
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy({"a": ["r"], "b": ["r"]}, {"r": ["a", "b"]})
    feats = np.eye(8, dtype=np.float32)
    labels = ["a", "b"] * 4
    with pytest.raises(ValueError, match="db_sharded requires"):
        evaluate_retrieval_features(
            feats, labels, h, mesh=get_mesh(8), db_sharded=True,
            compute_ap=True)
    with pytest.raises(ValueError, match="needs a mesh"):
        evaluate_retrieval_features(
            feats, labels, h, db_sharded=True, compute_ap=False,
            compute_ahp=4, ks=[1])


def test_special_learner_steps_sharded_match_single_device():
    """Labelembed and center-loss train steps (the special learners whose
    CLIs accept --gpus) must be numerically equal under the mesh."""
    import jax.numpy as jnp

    from semantic_embeddings_tpu.models.learners import (
        CenterLossModel,
        LabelEmbedModel,
    )
    from semantic_embeddings_tpu.train.special import (
        make_center_loss_train_step,
        make_labelembed_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    backbone = build_network(16, "simple").module
    rng = np.random.default_rng(0)
    labels = np.arange(32) % 4
    images = rng.normal(0, 0.1, (32, 8, 8, 3)).astype(np.float32)
    images += labels[:, None, None, None] / 4.0
    raw = {"image": jnp.asarray(images),
           "label": jnp.asarray(labels.astype(np.int32))}

    def prepare(r, k, train):
        return r["image"], r["label"]

    mesh = get_mesh(8)
    cases = [
        (LabelEmbedModel(backbone=backbone, num_classes=4),
         make_labelembed_train_step, {}),
        (CenterLossModel(backbone=backbone, num_classes=4, embed_dim=16),
         make_center_loss_train_step, {"num_classes": 4}),
    ]
    for model, make_step, kwargs in cases:
        variables = model.init(jax.random.PRNGKey(0), raw["image"],
                               raw["label"], train=False)
        key = jax.random.PRNGKey(2)

        # One step, tight tolerance (the convention of
        # test_sharded_step_matches_single_device): further steps compound
        # f32 reduction-order drift through per-tensor clipnorm.
        state1 = new_train_state(variables)
        step1 = make_step(model, prepare, **kwargs)
        state1, m1 = step1(state1, raw, 0.05, key)

        state8 = replicate(mesh, new_train_state(variables))
        sharded = shard_batch(mesh, raw)
        step8 = make_step(model, prepare, **kwargs)
        state8, m8 = step8(state8, sharded, 0.05, key)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5, err_msg=type(model).__name__)
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5,
                                       err_msg=type(model).__name__)
