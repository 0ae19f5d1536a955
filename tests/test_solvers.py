"""Embedding solvers: golden-pickle parity and mathematical properties."""

import os
import pickle

import numpy as np
import pytest

from semantic_embeddings_tpu.embeddings import (
    euclidean_embedding,
    load_embeddings,
    load_features,
    mds,
    save_embeddings,
    save_features,
    sim_approx,
    unitsphere_embedding,
)
from semantic_embeddings_tpu.hierarchy import ClassHierarchy, semantic_distance_matrix


def _random_tree_similarity(rng, n=40):
    """Similarity matrix of a random tree's leaf set (guaranteed PD).

    Uses its own fixed-seed generator so results don't depend on test order,
    and grows the tree until at least ``n`` leaves exist.
    """
    rng = np.random.default_rng(12345 + n)
    parents, children = {}, {}
    next_id = 1
    frontier = [0]

    def leaves():
        return [i for i in range(next_id) if not children.get(i)]

    while next_id < n * 2 or len(leaves()) < n:
        p = frontier[rng.integers(len(frontier))]
        c = next_id
        next_id += 1
        parents.setdefault(c, []).append(p)
        children.setdefault(p, []).append(c)
        frontier.append(c)
    h = ClassHierarchy(parents, children)
    chosen = sorted(h.leaves())[:n]
    return 1.0 - semantic_distance_matrix(h, chosen)


def test_unitsphere_golden_cifar(reference_dir):
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt"),
        id_type=int,
    )
    leaves = sorted(h.leaves())
    sim = 1.0 - semantic_distance_matrix(h, leaves)
    emb = unitsphere_embedding(sim)
    with open(
        os.path.join(reference_dir, "embeddings", "cifar100.unitsphere.pickle"), "rb"
    ) as f:
        gold = pickle.load(f)
    assert gold["ind2label"] == leaves
    assert np.abs(emb - gold["embedding"]).max() < 1e-12


@pytest.mark.parametrize(
    "golden,hier,is_a",
    [
        ("cub_balanced.unitsphere.pickle",
         "CUB-Hierarchy/cub_balanced.parent-child.txt", False),
        ("cub_flat.unitsphere.pickle",
         "CUB-Hierarchy/cub_flat.parent-child.txt", False),
        ("nab.unitsphere.pickle", "NAB-Hierarchy/hierarchy.txt", True),
    ],
)
def test_unitsphere_goldens(reference_dir, golden, hier, is_a):
    with open(os.path.join(reference_dir, "embeddings", golden), "rb") as f:
        gold = pickle.load(f)
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, hier), is_a_relations=is_a, id_type=int
    )
    dist = semantic_distance_matrix(h, gold["ind2label"])
    emb = unitsphere_embedding(1.0 - dist)
    assert np.abs(emb - gold["embedding"]).max() < 1e-12


def test_unitsphere_properties(rng):
    sim = _random_tree_similarity(rng)
    emb = unitsphere_embedding(sim)
    # Rows are unit norm, gram reproduces the similarities, lower-triangular.
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0)
    assert np.abs(emb @ emb.T - sim).max() < 1e-8
    assert np.allclose(emb, np.tril(emb))


def test_unitsphere_rejects_bad_input():
    with pytest.raises(ValueError):
        unitsphere_embedding(np.zeros((3, 4)))
    with pytest.raises(ValueError):
        unitsphere_embedding(np.zeros((0, 0)))
    with pytest.raises(RuntimeError):
        unitsphere_embedding(np.array([[1.0, 2.0], [2.0, 1.0]]))  # not PD


def test_sim_approx_full_rank(rng):
    sim = _random_tree_similarity(rng)
    emb = sim_approx(sim)
    assert np.abs(emb @ emb.T - sim).max() < 1e-8


def test_sim_approx_low_dim_beats_or_matches_golden(reference_dir):
    gold_path = os.path.join(reference_dir, "embeddings", "nab.sim128.pickle")
    with open(gold_path, "rb") as f:
        gold = pickle.load(f)
    labels = gold["ind2label"]
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, "NAB-Hierarchy", "hierarchy.txt"),
        is_a_relations=True,
        id_type=int,
    )
    sim = 1.0 - semantic_distance_matrix(h, labels)
    emb = sim_approx(sim, 128)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ge = gold["embedding"]
    # The top-128 eigenspace is degenerate here, so exact equality is
    # LAPACK-dependent; require our approximation error to be no worse.
    ours = np.abs(emb @ emb.T - sim).mean()
    golden = np.abs(ge @ ge.T - sim).mean()
    assert ours <= golden + 1e-3


def test_sim_approx_rejects_non_psd():
    with pytest.raises(RuntimeError):
        sim_approx(np.array([[1.0, 2.0], [2.0, 1.0]]))


def test_sim_approx_device_matches_golden_bound(reference_dir):
    """Device-path eigh (x64 jnp.linalg.eigh) meets the same nab.sim128
    approximation-error bound as the host LAPACK path (SURVEY §2.4 item 4:
    device-side linear algebra for both exact-method solvers)."""
    gold_path = os.path.join(reference_dir, "embeddings", "nab.sim128.pickle")
    with open(gold_path, "rb") as f:
        gold = pickle.load(f)
    labels = gold["ind2label"]
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, "NAB-Hierarchy", "hierarchy.txt"),
        is_a_relations=True,
        id_type=int,
    )
    sim = 1.0 - semantic_distance_matrix(h, labels)
    emb = sim_approx(sim, 128, device=True)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ge = gold["embedding"]
    ours = np.abs(emb @ emb.T - sim).mean()
    golden = np.abs(ge @ ge.T - sim).mean()
    assert ours <= golden + 1e-3
    # full-rank device path reconstructs the similarity matrix exactly
    full = sim_approx(sim, device=True)
    assert np.abs(full @ full.T - sim).max() < 1e-8


def test_euclidean_embedding_properties(rng):
    sim = _random_tree_similarity(rng, n=20)
    dist = 1.0 - sim
    emb = euclidean_embedding(dist)
    assert emb.shape == (20, 19)
    d = np.linalg.norm(emb[:, None, :] - emb[None, :, :], axis=-1)
    assert np.abs(d - dist).max() < 1e-6


def test_mds_properties(rng):
    sim = _random_tree_similarity(rng, n=20)
    dist = 1.0 - sim
    emb = mds(dist, num_dim=19)
    d = np.linalg.norm(emb[:, None, :] - emb[None, :, :], axis=-1)
    assert np.abs(d - dist).max() < 1e-6


def test_pickle_roundtrip(tmp_path, rng):
    emb = rng.normal(size=(7, 3))
    labels = ["a", "b", "c", "d", "e", "f", "g"]
    path = str(tmp_path / "emb.pickle")
    save_embeddings(path, labels, emb)
    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert set(raw.keys()) == {"ind2label", "label2ind", "embedding"}
    assert raw["ind2label"] == labels
    assert raw["label2ind"]["c"] == 2
    loaded_labels, loaded = load_embeddings(path)
    assert loaded_labels == labels
    assert np.array_equal(loaded, emb)


def test_feature_dump_roundtrip(tmp_path, rng):
    feats = rng.normal(size=(5, 4)).astype(np.float32)
    path = str(tmp_path / "feat.pickle")
    save_features(path, feats)
    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert list(raw.keys()) == ["feat"]
    assert sorted(raw["feat"].keys()) == [0, 1, 2, 3, 4]
    ids, loaded = load_features(path)
    assert np.array_equal(ids, np.arange(5))
    assert np.array_equal(loaded, feats)
