"""Device retrieval path vs. the reference evaluator as oracle."""

import os
import sys

import numpy as np
import pytest

from semantic_embeddings_tpu.evaluation.retrieval import (
    evaluate_retrieval_features,
    pairwise_retrieval,
)
from semantic_embeddings_tpu.hierarchy import ClassHierarchy


@pytest.fixture(scope="module")
def setup(reference_dir):
    sys.path.insert(0, reference_dir)
    try:
        from class_hierarchy import ClassHierarchy as RefHierarchy
    finally:
        sys.path.remove(reference_dir)
    path = os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt")
    ours = ClassHierarchy.from_file(path, id_type=int)
    ref = RefHierarchy.from_file(path, id_type=int)

    rng = np.random.default_rng(7)
    classes = sorted(ours.leaves())[:6]
    labels = [classes[i % 6] for i in range(120)]
    feats = rng.normal(size=(120, 12)).astype(np.float64)
    for i, l in enumerate(labels):
        feats[i, l % 12] += 2.0
    return ours, ref, feats, labels


def _oracle_ranking(feats, normalize):
    f = feats.copy()
    if normalize:
        f /= np.linalg.norm(f, axis=-1, keepdims=True)
        pdist = -f @ f.T
    else:
        sq = np.sum(f ** 2, axis=-1)
        pdist = sq[:, None] + sq[None, :] - 2 * (f @ f.T)
    return {i: list(np.argsort(pdist[i], kind="stable")) for i in range(len(f))}


@pytest.mark.parametrize("normalize", [True, False])
def test_device_retrieval_matches_oracle(setup, normalize):
    ours, ref, feats, labels = setup
    ks = [1, 5, 10, 50]
    want, _ = ref.hierarchical_precision(
        _oracle_ranking(feats, normalize), dict(enumerate(labels)), ks,
        compute_ahp=True, compute_ap=True, all_ids=list(range(len(labels))),
    )
    got, got_pq = evaluate_retrieval_features(
        feats.astype(np.float32), labels, ours, ks=ks,
        compute_ahp=True, compute_ap=True, normalize=normalize, block_size=37,
    )
    assert set(got) == set(want)
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-5), name


def test_pairwise_retrieval_generator(setup):
    _, _, feats, _ = setup
    gen = pairwise_retrieval(feats.astype(np.float32), normalize=True)
    qid, ranked = next(iter(gen))
    assert qid == 0
    assert ranked[0] == 0  # self pinned first
    assert sorted(ranked) == list(range(len(feats)))


def test_pairwise_retrieval_dict_input(setup, tmp_path):
    import pickle

    _, _, feats, _ = setup
    path = str(tmp_path / "f.pickle")
    with open(path, "wb") as f:
        pickle.dump(
            {"feat": {f"img{i}": feats[i].astype(np.float32) for i in range(20)}},
            f,
        )
    out = pairwise_retrieval(path, normalize=True, return_generator=False)
    assert set(out.keys()) == {f"img{i}" for i in range(20)}
    assert out["img3"][0] == "img3"
