"""Parity of the vectorized hierarchical-precision evaluator vs the reference.

The read-only reference checkout is imported as a *test oracle* (never at
runtime): both implementations evaluate identical synthetic rankings and must
produce the same numbers.
"""

import os
import sys

import numpy as np
import pytest

from semantic_embeddings_tpu.hierarchy import ClassHierarchy


@pytest.fixture(scope="module")
def oracle(reference_dir):
    sys.path.insert(0, reference_dir)
    try:
        from class_hierarchy import ClassHierarchy as RefHierarchy
    finally:
        sys.path.remove(reference_dir)
    return RefHierarchy


@pytest.fixture(scope="module")
def setup(reference_dir, oracle):
    path = os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt")
    ours = ClassHierarchy.from_file(path, id_type=int)
    ref = oracle.from_file(path, id_type=int)

    rng = np.random.default_rng(42)
    classes = sorted(ours.leaves())[:20]
    n_per = 8
    labels = {}
    img_id = 0
    for c in classes:
        for _ in range(n_per):
            labels[img_id] = c
            img_id += 1
    n = img_id

    # Synthetic retrieval: rank by noisy class similarity so rankings are
    # realistic (not random permutations).
    feats = rng.normal(size=(n, 16))
    for i in range(n):
        feats[i, labels[i] % 16] += 3.0
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    sims = feats @ feats.T
    retrieved = {
        qid: list(np.argsort(-sims[qid], kind="stable")) for qid in range(n)
    }
    return ours, ref, retrieved, labels, n


@pytest.mark.parametrize("ignore_qids", [True, False])
@pytest.mark.parametrize("ahp", [True, 20])
def test_matches_reference(setup, ignore_qids, ahp):
    ours, ref, retrieved, labels, n = setup
    ks = [1, 5, 10]
    kwargs = dict(
        ks=ks,
        compute_ahp=ahp,
        compute_ap=True,
        ignore_qids=ignore_qids,
        all_ids=list(range(n)),
    )
    got_means, got_pq = ours.hierarchical_precision(
        dict(retrieved), dict(labels), **kwargs
    )
    want_means, want_pq = ref.hierarchical_precision(
        dict(retrieved), dict(labels), **kwargs
    )
    assert set(got_means) == set(want_means)
    for name in want_means:
        assert got_means[name] == pytest.approx(want_means[name], abs=1e-10), name
    # Spot-check per-query values too.
    for name in want_pq:
        for qid in [0, 7, 101]:
            assert got_pq[name][qid] == pytest.approx(
                want_pq[name][qid], abs=1e-10
            ), (name, qid)


def test_generator_input_and_padding(setup):
    ours, ref, retrieved, labels, n = setup
    # Truncated rankings padded via all_ids, streamed through a generator.
    truncated = ((q, r[:50]) for q, r in retrieved.items())
    ref_truncated = {q: r[:50] for q, r in retrieved.items()}
    got, _ = ours.hierarchical_precision(
        truncated, labels, ks=[1, 10], compute_ahp=True, all_ids=list(range(n))
    )
    want, _ = ref.hierarchical_precision(
        ref_truncated, labels, ks=[1, 10], compute_ahp=True, all_ids=list(range(n))
    )
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-10), name


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_tree_property(oracle, seed):
    """Property test: on RANDOM tree topologies (uneven depth and branching)
    with fully random rankings, our evaluator must match the reference
    exactly.  (DAGs are excluded: the reference's Wu-Palmer tie-break among
    equally-deep subsumers is unspecified there — see ROUND_NOTES.md.)"""
    rng = np.random.default_rng(seed)

    # Random tree: each new node attaches to a uniformly-chosen existing one.
    n_nodes = int(rng.integers(20, 60))
    parents = {}
    for node in range(1, n_nodes):
        parents[node] = int(rng.integers(0, node))
    p_map = {c: [p] for c, p in parents.items()}
    c_map = _children_from(parents, n_nodes)
    ours = ClassHierarchy(dict(p_map), dict(c_map))
    ref = oracle(dict(p_map), dict(c_map))

    leaves = sorted(set(range(n_nodes)) - set(parents.values()))
    n_items = 60
    labels = {i: leaves[int(rng.integers(0, len(leaves)))]
              for i in range(n_items)}
    retrieved = {
        q: list(rng.permutation(n_items)) for q in range(n_items)
    }

    got, _ = ours.hierarchical_precision(
        retrieved, labels, ks=[1, 5, 20], compute_ahp=True, compute_ap=True,
        ignore_qids=True,
    )
    want, _ = ref.hierarchical_precision(
        {q: list(r) for q, r in retrieved.items()}, dict(labels),
        ks=[1, 5, 20], compute_ahp=True, compute_ap=True, ignore_qids=True,
    )
    assert set(got) == set(want)
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-10), name


def _children_from(parents, n_nodes):
    children = {}
    for c, p in parents.items():
        children.setdefault(p, []).append(c)
    return children
