"""Large-hierarchy validation: ILSVRC WordNet (incl. the 73k-node DAG)."""

import json
import os
import random

import numpy as np
import pytest

from semantic_embeddings_tpu.embeddings import unitsphere_embedding
from semantic_embeddings_tpu.hierarchy import (
    ClassHierarchy,
    pairwise_matrices,
    semantic_distance_matrix,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ilsvrc_classes(reference_dir):
    path = os.path.join(reference_dir, "ILSVRC", "imagenet_class_index.json")
    return [c[0] for c in json.load(open(path)).values()]


def test_mintree_unitsphere(reference_dir, ilsvrc_classes):
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, "ILSVRC", "wordnet.parent-child.mintree.txt"),
        id_type=str,
    )
    assert h.is_tree()
    dist = semantic_distance_matrix(h, ilsvrc_classes)
    emb = unitsphere_embedding(1.0 - dist)
    assert np.abs(emb @ emb.T - (1.0 - dist)).max() < 1e-10


def test_pruned_wordnet_dag(reference_dir, ilsvrc_classes):
    """The 73k-node multi-parent DAG: matrix path must equal the scalar API."""
    h = ClassHierarchy.from_file(
        os.path.join(reference_dir, "ILSVRC", "wordnet.parent-child.pruned.txt"),
        id_type=str,
    )
    assert not h.is_tree()
    mats = pairwise_matrices(h, ilsvrc_classes)
    idx = {c: i for i, c in enumerate(ilsvrc_classes)}
    rng = random.Random(1)
    for _ in range(25):
        a, b = rng.sample(ilsvrc_classes, 2)
        assert mats["lcs_height"][idx[a], idx[b]] == pytest.approx(
            h.lcs_height(a, b)
        )
        assert mats["wup"][idx[a], idx[b]] == pytest.approx(
            h.wup_similarity(a, b)
        )
