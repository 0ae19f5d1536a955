"""Regression tests for the round-1 self-review findings.

Each test pins a bug found by cross-checking against the reference:
prefetch sentinel drop (deadlock), Keras ModelCheckpoint mode='auto'
semantics, forest LCS silent garbage, fixed augmentation RNG in feature
extraction, queue_size units, epoch-mean train metrics, the reference's
balanced-accuracy denominator, and the labelembed batch-coupled eval term.
"""

import threading
import time
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# prefetch: sentinel must survive a full queue; worker errors must propagate
# ---------------------------------------------------------------------------

def _consume_with_watchdog(gen, timeout=20.0):
    out, err = [], []

    def run():
        try:
            out.extend(gen)
        except BaseException as e:  # noqa: BLE001
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    assert not t.is_alive(), "prefetch consumer deadlocked (sentinel lost)"
    return out, err


def test_prefetch_sentinel_not_dropped_when_queue_full():
    from semantic_embeddings_tpu.data.files import prefetch

    def slow_consumer_items():
        for i in range(5):
            yield i

    # size=1: the worker fills the queue and exhausts while the consumer
    # is still slow — the done sentinel used to be put_nowait and dropped.
    gen = prefetch(slow_consumer_items(), size=1)

    def consume():
        for item in gen:
            time.sleep(0.05)  # keep the queue full at iterator exhaustion
            yield item

    out, err = _consume_with_watchdog(consume())
    assert out == [0, 1, 2, 3, 4]
    assert not err


def test_prefetch_propagates_worker_exception():
    from semantic_embeddings_tpu.data.files import prefetch

    def bad_iterator():
        yield 1
        raise RuntimeError("decode failed")

    out, err = _consume_with_watchdog(prefetch(bad_iterator(), size=2))
    assert out == [1]
    assert len(err) == 1 and "decode failed" in str(err[0])


def test_prefetch_early_close_stops_worker():
    from semantic_embeddings_tpu.data.files import prefetch

    stopped = threading.Event()

    def items():
        try:
            for i in range(1000):
                yield i
        finally:
            stopped.set()

    gen = prefetch(items(), size=1)
    assert next(gen) == 0
    gen.close()
    assert stopped.wait(5.0), "worker kept running after consumer close"


# ---------------------------------------------------------------------------
# fit(): snapshot_best mode='auto', missing-metric warning, epoch-mean metrics
# ---------------------------------------------------------------------------

class _StubData:
    def __init__(self, n_batches=3):
        self.n = n_batches

    def steps_per_epoch(self, batch_size):
        return self.n

    def train_batches(self, batch_size, epoch, seed):
        for i in range(self.n):
            yield {"i": i}

    def test_batches(self, batch_size):
        yield {"i": 0}


def _stub_state():
    from semantic_embeddings_tpu.train import new_train_state

    return new_train_state(
        {"params": {"w": jnp.zeros((1,))}, "batch_stats": {}}
    )


def _fit(state, accs_per_epoch, losses_per_batch, **kw):
    """Runs fit() with stub steps; returns (state, logged, saved_epochs)."""
    from semantic_embeddings_tpu.train.schedules import PiecewiseSchedule
    from semantic_embeddings_tpu.train.trainer import fit

    epoch_idx = {"v": 0}

    def train_step(state, raw, lr, rng):
        return (
            state.replace(step=state.step + 1),
            {"loss": jnp.asarray(losses_per_batch[int(raw["i"])],
                                 jnp.float32)},
        )

    def eval_step(state, raw, rng):
        acc = accs_per_epoch[min(epoch_idx["v"], len(accs_per_epoch) - 1)]
        epoch_idx["v"] += 1
        return {"emb_correct": acc, "count": 1.0, "total_loss": 1.0 - acc}

    logged = []
    state = fit(
        state, train_step, eval_step, _StubData(len(losses_per_batch)),
        PiecewiseSchedule([(0, 0.1)]),
        epochs=len(accs_per_epoch), batch_size=4, verbose=False,
        log_fn=lambda e, m: logged.append(m), **kw,
    )
    return state, logged


def test_snapshot_best_maximizes_accuracy_metrics(tmp_path):
    from semantic_embeddings_tpu.train.state import load_checkpoint_raw

    snap = str(tmp_path / "best.ckpt")
    # acc up then down: the best checkpoint is epoch 2, NOT epoch 3 (the
    # reference's keras ModelCheckpoint(mode='auto') maximizes '*acc*').
    _fit(_stub_state(), [0.3, 0.5, 0.2], [0.0], snapshot=snap,
         snapshot_best="emb_acc")
    _, meta = load_checkpoint_raw(snap)
    assert meta["epoch"] == 2


def test_snapshot_best_minimizes_losses(tmp_path):
    from semantic_embeddings_tpu.train.state import load_checkpoint_raw

    snap = str(tmp_path / "best.ckpt")
    _fit(_stub_state(), [0.3, 0.5, 0.2], [0.0], snapshot=snap,
         snapshot_best="val_loss")  # val_loss = 1 - acc: best at epoch 2
    _, meta = load_checkpoint_raw(snap)
    assert meta["epoch"] == 2


def test_snapshot_best_missing_metric_warns_not_silent(tmp_path):
    import os

    snap = str(tmp_path / "best.ckpt")
    with pytest.warns(RuntimeWarning, match="bogus_metric"):
        _fit(_stub_state(), [0.3, 0.5], [0.0], snapshot=snap,
             snapshot_best="bogus_metric")
    assert not os.path.exists(snap)


def test_train_metrics_are_epoch_means_not_last_batch():
    # Per-batch losses 0, 1, 2 -> the logged epoch 'loss' must be 1.0
    # (Keras reports running epoch averages), not the last batch's 2.0.
    _, logged = _fit(_stub_state(), [0.5], [0.0, 1.0, 2.0])
    assert logged[0]["loss"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# hierarchy: disconnected forests must raise, not return garbage
# ---------------------------------------------------------------------------

def test_lcs_height_raises_on_forest():
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    # Two disconnected trees: {r1 -> a, b} and {r2 -> c}.
    h = ClassHierarchy(
        parents={"a": ["r1"], "b": ["r1"], "c": ["r2"]},
        children={"r1": ["a", "b"], "r2": ["c"]},
    )
    assert h.lcs_height("a", "b") == pytest.approx(
        h._height_arr[h._node_index["r1"]] / h.max_height
    )
    assert h.lcs("a", "c") is None  # documented None for the plain lcs API
    with pytest.raises(ValueError, match="common subsumer"):
        h.lcs_height("a", "c")
    with pytest.raises(ValueError, match="common subsumer"):
        h.wup_similarity("a", "c")


# ---------------------------------------------------------------------------
# balanced accuracy: reference denominator is len(bincount), not classes seen
# ---------------------------------------------------------------------------

def test_balanced_accuracy_reference_denominator():
    from semantic_embeddings_tpu.train.metrics import balanced_accuracy

    # Class 1 absent from the test labels: the reference divides by
    # len(np.bincount(y_true)) = 3 (learn_image_embeddings.py:252-255).
    y_true = np.array([0, 0, 2])
    y_pred = np.array([0, 0, 2])
    ref = ((y_pred == y_true) / np.bincount(y_true)[y_true]).sum() / len(
        np.bincount(y_true)
    )
    assert balanced_accuracy(y_pred, y_true, num_classes=10) == pytest.approx(ref)
    assert ref == pytest.approx(2.0 / 3.0)


# ---------------------------------------------------------------------------
# labelembed loss: padded eval rows must not skew the batch-coupled term
# ---------------------------------------------------------------------------

def test_labelembed_eval_ignores_padded_rows():
    from semantic_embeddings_tpu.train.losses import labelembed_loss

    rng = np.random.default_rng(0)
    k, pad, c = 3, 5, 7
    out1 = rng.normal(size=(k + pad, c)).astype(np.float32)
    out2 = rng.normal(size=(k + pad, c)).astype(np.float32)
    tar = rng.normal(size=(k + pad, c)).astype(np.float32)
    labels = rng.integers(0, c, k + pad)
    # Padding duplicates the last real row (the masked-batch convention).
    for arr in (out1, out2, tar, labels):
        arr[k:] = arr[k - 1]
    valid = np.array([1.0] * k + [0.0] * pad, np.float32)

    masked = labelembed_loss(
        jnp.asarray(out1), jnp.asarray(out2), jnp.asarray(tar),
        jnp.asarray(labels), valid=jnp.asarray(valid),
    )
    real = labelembed_loss(
        jnp.asarray(out1[:k]), jnp.asarray(out2[:k]), jnp.asarray(tar[:k]),
        jnp.asarray(labels[:k]),
    )
    np.testing.assert_allclose(
        np.asarray(masked[:k]), np.asarray(real), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# extract_by_tap: --augmentation_epochs must see fresh augmentations
# ---------------------------------------------------------------------------

def test_feature_extraction_augmentations_differ_across_epochs():
    import flax.linen as nn

    from semantic_embeddings_tpu.cli.common import extract_by_tap
    from semantic_embeddings_tpu.data import SyntheticDataset

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return jnp.mean(x, axis=(1, 2))  # (B, C) summary of the pixels

    dataset = SyntheticDataset(num_classes=4, n_train=8, n_test=4, size=8)
    model = Probe()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    prepare = dataset.make_prepare(augment_train=True)

    batches = list(dataset.train_eval_batches(8, augment=True, epochs=2))
    feats = extract_by_tap(model, variables, prepare, batches,
                           train_branch=True)
    e1, e2 = feats[:8], feats[8:]
    assert not np.allclose(e1, e2), (
        "identical augmentations across --augmentation_epochs passes"
    )
    # Deterministic under the same seed.
    feats_again = extract_by_tap(model, variables, prepare, iter(batches),
                                 train_branch=True)
    np.testing.assert_allclose(feats, feats_again, rtol=1e-6)


# ---------------------------------------------------------------------------
# pipeline args: all learners wire --read_workers/--queue_size (in batches)
# ---------------------------------------------------------------------------

def test_apply_pipeline_args_units_and_wiring():
    from semantic_embeddings_tpu.cli.common import apply_pipeline_args

    ds = types.SimpleNamespace(read_workers=8, queue_size=4)
    args = types.SimpleNamespace(read_workers=32, queue_size=100,
                                 batch_size=256)
    apply_pipeline_args(ds, args)
    assert ds.read_workers == 32
    assert ds.queue_size == 100  # batches, like Keras max_queue_size

    # Learner CLIs must all call the helper after building their dataset.
    import inspect

    from semantic_embeddings_tpu.cli import (
        learn_center_loss,
        learn_classifier,
        learn_devise,
        learn_image_embeddings,
        learn_labelembedding,
    )

    for mod in (learn_image_embeddings, learn_classifier, learn_devise,
                learn_labelembedding, learn_center_loss):
        assert "apply_pipeline_args" in inspect.getsource(mod), mod.__name__


# ---------------------------------------------------------------------------
# second/third review-pass fixes
# ---------------------------------------------------------------------------

def test_device_cholesky_works_on_current_jax():
    """jax.experimental.enable_x64 was removed in JAX 0.9; the device=True
    unitsphere path must use the current API and keep float64 precision."""
    from semantic_embeddings_tpu.embeddings.solvers import unitsphere_embedding

    S = np.full((5, 5), 0.3)
    np.fill_diagonal(S, 1.0)
    e = unitsphere_embedding(S, device=True)
    np.testing.assert_allclose(e @ e.T, S, atol=1e-10)


def test_retrieval_rejects_short_labels():
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy({"a": ["r"], "b": ["r"]}, {"r": ["a", "b"]})
    feats = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="4 entries for 6 feature rows"):
        evaluate_retrieval_features(feats, ["a", "b", "a", "b"], h, ks=[1])


def test_hierarchical_precision_missing_query_matches_reference():
    """Rankings that do not contain their own query id (query-excluded
    protocols, or malformed rows) are evaluated WITHOUT qid removal,
    exactly like the reference's ``except ValueError: pass`` fallback
    (class_hierarchy.py:289-297) — verified against the oracle."""
    import sys

    from semantic_embeddings_tpu.evaluation.hierarchical import (
        hierarchical_precision,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    parents = {"a": ["r"], "b": ["r"], "c": ["s"], "r": ["t"], "s": ["t"]}
    children = {"r": ["a", "b"], "s": ["c"], "t": ["r", "s"]}
    h = ClassHierarchy({k: list(v) for k, v in parents.items()},
                       {k: list(v) for k, v in children.items()})
    labels = {0: "a", 1: "b", 2: "a", 3: "c"}
    rankings = {
        0: [0, 1, 2, 3],
        1: [1, 0, 2, 3],
        2: [0, 1, 0, 3],  # omits query 2 (duplicate of 0): no removal
        3: [3, 0, 1, 2],
    }
    means, perq = hierarchical_precision(
        h, dict(rankings), labels, ks=[1, 2], compute_ahp=True)

    sys.path.insert(0, "/root/reference")
    import class_hierarchy as ref_mod

    ref = ref_mod.ClassHierarchy({k: list(v) for k, v in parents.items()},
                                 {k: list(v) for k, v in children.items()})
    ref_means, ref_perq = ref.hierarchical_precision(
        dict(rankings), labels, ks=[1, 2], compute_ahp=True,
        ignore_qids=True)
    for name, val in ref_means.items():
        # NaN == NaN counts as parity (zero optimal cumsum at k after
        # removal produces NaN in the reference as well).
        np.testing.assert_allclose(means[name], val, atol=1e-12,
                                   equal_nan=True, err_msg=name)


# ---------------------------------------------------------------------------
# fourth review-pass fixes (train/models/data/parallel)
# ---------------------------------------------------------------------------

def test_initialize_distributed_order_and_idempotence(monkeypatch):
    """jax.distributed.initialize must be attempted whenever a coordinator
    is configured (it raises if the backend was initialized first, so the
    env check must come before ANY device query), and an
    'already initialized' RuntimeError must be swallowed."""
    from semantic_embeddings_tpu.parallel import initialize_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_distributed()
    assert calls == []  # no coordinator configured -> no-op

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    initialize_distributed()
    assert calls == [1]

    def raise_already(*a, **k):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raise_already)
    initialize_distributed()  # must not raise

    def raise_other(*a, **k):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", raise_other)
    with pytest.raises(RuntimeError, match="unreachable"):
        initialize_distributed()


def test_l2_filters_are_first_match_wins_so_specific_rules_go_first():
    """The cls head must get the reference's l2(5e-4)
    (learn_image_embeddings.py:44) even when the backbone spec has a
    catch-all like ('.*', 2e-4) — the CLI PREPENDS the cls_top rule."""
    from semantic_embeddings_tpu.models import build_network

    spec = build_network(8, "resnet-32")
    assert any(p == r".*" for p, _ in spec.l2_filters), "premise: catch-all"
    spec.l2_filters = [(r"^cls_top$", 5e-4)] + list(spec.l2_filters)
    params = {
        "backbone": {"conv0": {"kernel": jnp.ones((2, 2))}},
        "cls_top": {"kernel": jnp.ones((2, 2))},
    }
    # catch-all 2e-4 for the backbone kernel + 5e-4 for the cls head.
    expect = 2e-4 * 4 + 5e-4 * 4
    assert float(spec.l2_penalty(params)) == pytest.approx(expect)


def test_l2_penalty_and_coef_tree_are_mutually_exclusive():
    from semantic_embeddings_tpu.train import make_train_step

    with pytest.raises(ValueError, match="not both"):
        make_train_step(object(), lambda *a: None,
                        l2_penalty_fn=lambda p: 0.0, l2_coef_tree={})


def test_wrn_dropout_trains_with_rng():
    """WideResNet(dropout>0) previously crashed at trace time ('Need PRNG
    for rng: dropout') because no train step supplied dropout rngs."""
    from semantic_embeddings_tpu.models.wrn import WideResNet
    from semantic_embeddings_tpu.models import EmbeddingModel
    from semantic_embeddings_tpu.train import make_train_step, new_train_state

    model = EmbeddingModel(
        backbone=WideResNet(classes=4, n_blocks=1, width=1, dropout=0.3,
                            final_activation=None),
        output="l2norm",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                           train=False)
    state = new_train_state(variables)
    step = make_train_step(
        model, lambda raw, rng, train: (raw["x"], raw["y"]),
        loss_name="inv_corr", class_embedding=np.eye(4, dtype=np.float32),
    )
    raw = {"x": np.random.default_rng(0).normal(size=(4, 8, 8, 3))
           .astype(np.float32), "y": np.array([0, 1, 2, 3])}
    state, metrics = step(state, raw, 0.1, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_wrn_bn_gamma_uniform_init():
    """The reference WRN passes gamma_initializer='uniform'
    (RandomUniform(-0.05, 0.05)) on every BatchNorm."""
    from semantic_embeddings_tpu.models.wrn import WideResNet

    m = WideResNet(classes=4, n_blocks=1, width=1, final_activation=None)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=False)
    scales = [np.asarray(l) for path, l in
              jax.tree_util.tree_flatten_with_path(v["params"])[0]
              if str(path[-1]).find("scale") >= 0]
    assert scales, "no BN scale params found"
    flat = np.concatenate([s.ravel() for s in scales])
    assert flat.min() >= -0.05 and flat.max() <= 0.05
    assert not np.allclose(flat, 1.0)


def test_cls_base_requires_flat_tap():
    """--cls_base naming a conv module (4-D feature map) must raise a clear
    error instead of producing per-position logits that crash later in the
    loss with an opaque broadcast error."""
    from semantic_embeddings_tpu.models import EmbeddingModel, build_network

    spec = build_network(16, "resnet-110-fc")
    spec.module = spec.module.clone(n=2)
    model = EmbeddingModel(backbone=spec.module, output="l2norm",
                           cls_classes=4, cls_base="stage2_block1")
    with pytest.raises(ValueError, match="flat .batch, features. tap"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                   train=False)

    # A flat module ('top' Dense) works.
    ok = EmbeddingModel(backbone=spec.module, output="l2norm",
                        cls_classes=4, cls_base="top")
    v = ok.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)), train=False)
    emb, prob = ok.apply(v, jnp.zeros((2, 8, 8, 3)), train=False)
    assert prob.shape == (2, 4)


# ---------------------------------------------------------------------------
# seventh review-pass fixes
# ---------------------------------------------------------------------------

def test_retrieval_pairs_labels_by_dump_ids():
    """Feature dumps key rows by image ID in arbitrary order; labels must
    be paired by ID like the reference (labels_test[id]), not by row
    position."""
    from semantic_embeddings_tpu.evaluation.retrieval import (
        evaluate_retrieval_features,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    h = ClassHierarchy(
        {"a": ["r"], "b": ["r"], "c": ["s"], "r": ["t"], "s": ["t"]},
        {"r": ["a", "b"], "s": ["c"], "t": ["r", "s"]},
    )
    rng = np.random.default_rng(0)
    n = 24
    labels = [["a", "b", "c"][i % 3] for i in range(n)]
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    for i in range(n):
        feats[i, i % 3] += 3.0
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)

    ascending = {"feat": {i: feats[i] for i in range(n)}}
    perm = rng.permutation(n)
    shuffled = {"feat": {int(i): feats[i] for i in perm}}

    m1, _ = evaluate_retrieval_features(ascending, labels, h, ks=[1, 5],
                                        normalize=True)
    m2, _ = evaluate_retrieval_features(shuffled, labels, h, ks=[1, 5],
                                        normalize=True)
    for name in m1:
        assert m1[name] == pytest.approx(m2[name], abs=1e-9), name


def test_label_range_and_mesh_batch_guards():
    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.data import SyntheticDataset
    from semantic_embeddings_tpu.parallel import get_mesh

    ds = SyntheticDataset(num_classes=10, n_train=20, n_test=10)
    common.check_label_range(ds, 10)  # exact fit: fine
    with pytest.raises(SystemExit, match="only 5 rows"):
        common.check_label_range(ds, 5)

    if len(jax.devices()) >= 8:
        mesh = get_mesh(8)
        common.check_mesh_batch(mesh, 64, 256)  # divisible: fine
        with pytest.raises(SystemExit, match="not divisible"):
            common.check_mesh_batch(mesh, 100)
    common.check_mesh_batch(None, 100)  # no mesh: no-op


def test_external_query_class_matches_reference(reference_dir):
    """Queries whose class never occurs in the database (external queries)
    must evaluate like the reference, which computes pair similarities
    lazily."""
    import sys

    from semantic_embeddings_tpu.evaluation.hierarchical import (
        hierarchical_precision,
    )
    from semantic_embeddings_tpu.hierarchy import ClassHierarchy

    parents = {"a": ["r"], "b": ["r"], "c": ["s"], "r": ["t"], "s": ["t"]}
    children = {"r": ["a", "b"], "s": ["c"], "t": ["r", "s"]}
    h = ClassHierarchy({k: list(v) for k, v in parents.items()},
                       {k: list(v) for k, v in children.items()})
    # database items 0..3 are classes a/b only; query 9 is class 'c'
    labels = {0: "a", 1: "b", 2: "a", 3: "b", 9: "c"}
    rankings = {0: [0, 1, 2, 3], 9: [1, 0, 3, 2]}
    means, perq = hierarchical_precision(h, dict(rankings), labels, ks=[1, 2])

    sys.path.insert(0, reference_dir)
    import class_hierarchy as ref_mod

    ref = ref_mod.ClassHierarchy({k: list(v) for k, v in parents.items()},
                                 {k: list(v) for k, v in children.items()})
    ref_means, _ = ref.hierarchical_precision(
        dict(rankings), labels, ks=[1, 2], ignore_qids=True)
    for name, val in ref_means.items():
        np.testing.assert_allclose(means[name], val, atol=1e-12,
                                   equal_nan=True, err_msg=name)
