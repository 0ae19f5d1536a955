"""Hierarchy math: scalar API, vectorized matrices, golden-file parity."""

import os
import pickle

import numpy as np
import pytest

from semantic_embeddings_tpu.hierarchy import (
    ClassHierarchy,
    pairwise_matrices,
    semantic_distance_matrix,
)


@pytest.fixture(scope="module")
def cifar_hierarchy(reference_dir):
    return ClassHierarchy.from_file(
        os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt"),
        id_type=int,
    )


def test_basic_structure(cifar_hierarchy):
    h = cifar_hierarchy
    assert h.is_tree()
    assert h.max_height == 8
    leaves = h.leaves()
    assert len(leaves) == 100
    assert all(h.heights[leaf] == 0 for leaf in leaves)


def test_scalar_identities(cifar_hierarchy):
    h = cifar_hierarchy
    leaves = sorted(h.leaves())
    for a in leaves[:5]:
        assert h.lcs(a, a) == a
        assert h.lcs_height(a, a) == 0.0
        assert h.wup_similarity(a, a) == 1.0
        assert h.shortest_path_length(a, a) == 0
    # symmetry
    a, b = leaves[3], leaves[77]
    assert h.lcs_height(a, b) == h.lcs_height(b, a)
    assert h.wup_similarity(a, b) == h.wup_similarity(b, a)


def test_matrix_matches_scalar(cifar_hierarchy):
    h = cifar_hierarchy
    leaves = sorted(h.leaves())[:25]
    mats = pairwise_matrices(h, leaves)
    for i, a in enumerate(leaves):
        for j, b in enumerate(leaves):
            assert mats["lcs_height"][i, j] == pytest.approx(h.lcs_height(a, b))
            assert mats["wup"][i, j] == pytest.approx(h.wup_similarity(a, b))


def test_dag_multi_parent():
    # Diamond: root -> {a, b} -> c ; plus leaf d under a.
    parents = {"a": ["r"], "b": ["r"], "c": ["a", "b"], "d": ["a"]}
    children = {"r": ["a", "b"], "a": ["c", "d"], "b": ["c"]}
    h = ClassHierarchy(parents, children)
    assert not h.is_tree()
    assert h.max_height == 2
    # LCS(c, d) = a (depth 2), not the root.
    assert h.lcs("c", "d") == "a"
    assert h.lcs_height("c", "d") == pytest.approx(h.heights["a"] / 2)
    mats = pairwise_matrices(h, ["c", "d"])
    assert mats["lcs_height"][0, 1] == pytest.approx(h.lcs_height("c", "d"))
    assert mats["wup"][0, 1] == pytest.approx(h.wup_similarity("c", "d"))


def test_is_a_parsing(tmp_path):
    p = tmp_path / "rel.txt"
    p.write_text("1 0\n2 0\n3 1\n")
    h = ClassHierarchy.from_file(str(p), is_a_relations=True, id_type=int)
    assert h.parents[1] == [0]
    assert h.parents[3] == [1]
    assert sorted(h.leaves()) == [2, 3]
    # round-trip through save()
    out = tmp_path / "saved.txt"
    h.save(str(out), is_a_relations=True)
    h2 = ClassHierarchy.from_file(str(out), is_a_relations=True, id_type=int)
    assert h2.parents == h.parents


def test_semantic_distance_matrix_symmetry(cifar_hierarchy):
    leaves = sorted(cifar_hierarchy.leaves())
    dist = semantic_distance_matrix(cifar_hierarchy, leaves)
    assert np.allclose(dist, dist.T)
    assert np.all(dist.diagonal() == 0)
    assert dist.max() <= 1.0


def test_device_pairwise_matches_host(cifar_hierarchy):
    from semantic_embeddings_tpu.hierarchy.vectorized import (
        pairwise_matrices_device,
    )

    leaves = sorted(cifar_hierarchy.leaves())
    host = pairwise_matrices(cifar_hierarchy, leaves)
    dev = pairwise_matrices_device(cifar_hierarchy, leaves)
    assert np.allclose(host["lcs_height"], dev["lcs_height"])
    assert np.allclose(host["wup"], dev["wup"])


def test_cub_wikispecies_golden(reference_dir):
    h = ClassHierarchy.from_file(
        os.path.join(
            reference_dir, "CUB-Hierarchy", "cub_wikispecies.parent-child.txt"
        ),
        id_type=int,
    )
    gold_path = os.path.join(
        reference_dir, "embeddings", "cub_wikispecies.unitsphere.pickle"
    )
    with open(gold_path, "rb") as f:
        gold = pickle.load(f)
    labels = gold["ind2label"]
    dist = semantic_distance_matrix(h, labels)
    ge = gold["embedding"]
    # The golden unit-sphere embedding reproduces 1 - dist exactly,
    # confirming our pairwise LCS-height matrix on string-id trees.
    assert np.abs(ge @ ge.T - (1.0 - dist)).max() < 1e-6


@pytest.mark.parametrize("seed", [3, 4])
def test_random_tree_wup_lcs_vs_oracle(reference_dir, seed):
    """Random-topology parity: scalar WUP / LCS-height dissimilarity against
    the reference implementation on trees the CIFAR fixture can't cover
    (uneven depth/branching)."""
    import sys

    sys.path.insert(0, reference_dir)
    try:
        from class_hierarchy import ClassHierarchy as RefHierarchy
    finally:
        sys.path.remove(reference_dir)

    rng = np.random.default_rng(seed)
    n_nodes = int(rng.integers(25, 70))
    parents = {c: int(rng.integers(0, c)) for c in range(1, n_nodes)}
    children = {}
    for c, p in parents.items():
        children.setdefault(p, []).append(c)
    p_map = {c: [p] for c, p in parents.items()}
    ours = ClassHierarchy(dict(p_map), {k: list(v) for k, v in children.items()})
    ref = RefHierarchy(dict(p_map), {k: list(v) for k, v in children.items()})

    leaves = sorted(set(range(n_nodes)) - set(parents.values()))
    from semantic_embeddings_tpu.hierarchy import pairwise_matrices

    mats = pairwise_matrices(ours, leaves)
    for i, a in enumerate(leaves):
        for j, b in enumerate(leaves):
            assert mats["wup"][i, j] == pytest.approx(
                ref.wup_similarity(a, b), abs=1e-10), (a, b)
            assert mats["lcs_height"][i, j] == pytest.approx(
                ref.lcs_height(a, b), abs=1e-10), (a, b)


def test_dag_wup_routed_distances_match_reference(reference_dir):
    """On multi-parent DAGs the reference's WUP distances route through
    shallower common hypernyms (shortest_path_length, class_hierarchy.py:
    143-156,192-193) — NOT the direct upward distance.  Repro from review:
    the L-vs-R routing case, plus randomized DAG parity on every pair
    whose max-depth subsumer is unique (where the reference's own pick is
    well-defined)."""
    import sys

    sys.path.insert(0, reference_dir)
    import class_hierarchy as ref_mod

    parents = {"L": ["R"], "c2": ["L"], "c1": ["c2"], "a": ["c1", "R"],
               "b": ["L"]}
    children = {}
    for c, ps in parents.items():
        for p in ps:
            children.setdefault(p, []).append(c)
    h = ClassHierarchy({k: list(v) for k, v in parents.items()},
                       {k: list(v) for k, v in children.items()})
    ref = ref_mod.ClassHierarchy({k: list(v) for k, v in parents.items()},
                                 {k: list(v) for k, v in children.items()})
    assert h.wup_similarity("a", "b") == pytest.approx(
        ref.wup_similarity("a", "b"))
    assert h.wup_similarity("a", "b") == pytest.approx(4.0 / 7.0)

    rng = np.random.default_rng(3)
    for trial in range(8):
        n_nodes = int(rng.integers(8, 32))
        parents, children = {}, {}
        for v in range(1, n_nodes):
            ps = rng.choice(v, size=min(1 + (rng.random() < 0.3), v),
                            replace=False)
            parents[v] = [int(p) for p in ps]
            for p in ps:
                children.setdefault(int(p), []).append(v)
        h = ClassHierarchy({k: list(v) for k, v in parents.items()},
                           {k: list(v) for k, v in children.items()})
        ref = ref_mod.ClassHierarchy(
            {k: list(v) for k, v in parents.items()},
            {k: list(v) for k, v in children.items()})
        leaves = sorted(h.leaves())
        if len(leaves) < 2:
            continue
        from semantic_embeddings_tpu.hierarchy.vectorized import (
            pairwise_matrices,
        )

        mats = pairwise_matrices(h, leaves)
        for i, a in enumerate(leaves):
            for j, b in enumerate(leaves):
                if i >= j:
                    continue
                sv = h.wup_similarity(a, b)
                # the two public APIs must ALWAYS agree
                assert mats["wup"][i, j] == pytest.approx(sv, abs=1e-12)
                anc_a = h._ancestors(h._node_index[a])
                anc_b = h._ancestors(h._node_index[b])
                common = set(anc_a) & set(anc_b)
                depths = [int(h._depth_max_arr[c]) for c in common]
                if depths.count(max(depths)) == 1:
                    assert sv == pytest.approx(ref.wup_similarity(a, b),
                                               abs=1e-12)
