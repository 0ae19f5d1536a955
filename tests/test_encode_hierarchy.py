"""Taxonomy converter: indented-tree parsing and semantic round-trips."""

import os
import pickle

import numpy as np
import pytest

from semantic_embeddings_tpu.cli.encode_hierarchy import (
    assign_numeric_ids,
    inat_edges,
    main,
    parse_indented_tree,
)
from semantic_embeddings_tpu.hierarchy import ClassHierarchy, pairwise_matrices


def test_parse_indented_tree(tmp_path):
    p = tmp_path / "tree.txt"
    p.write_text("root\n-- a\n---- x\n---- y (note) ?\n-- b\n")
    children = parse_indented_tree(str(p))
    assert children["root"] == ["a", "b"]
    assert children["a"] == ["x", "y (note) ?"]
    stripped = parse_indented_tree(str(p), strip_annotations=True)
    assert stripped["a"] == ["x", "y"]


def test_parse_rejects_bad_indentation(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("root\n------ too deep\n")
    with pytest.raises(ValueError, match="jumps"):
        parse_indented_tree(str(p))


def test_assign_numeric_ids_seeding():
    children = {"root": ["a", "b"], "a": [], "b": []}
    numeric, names = assign_numeric_ids(children, seed_labels=["a", "b"])
    assert names[:2] == ["a", "b"]
    assert numeric[2] == [0, 1]  # root gets the first free id


def test_cifar_reencoding_semantically_identical(reference_dir, tmp_path):
    """Re-encoding the human-readable CIFAR tree must induce exactly the
    same leaf-pair similarities as the shipped edge list (internal-node
    numbering is arbitrary)."""
    names = {}
    with open(os.path.join(reference_dir, "Cifar-Hierarchy", "class_names.txt")) as f:
        for line in f:
            if line.strip():
                idx, name = line.strip().split(maxsplit=1)
                names[int(idx)] = name
    meta = tmp_path / "meta"
    with open(meta, "wb") as f:
        pickle.dump(
            {b"fine_label_names": [names[i].encode() for i in range(100)]}, f
        )
    out = str(tmp_path / "edges.txt")
    main([
        os.path.join(reference_dir, "Cifar-Hierarchy", "hierarchy.txt"),
        "--meta_file", str(meta), "--out", out,
    ])
    ours = ClassHierarchy.from_file(out, id_type=int)
    ref = ClassHierarchy.from_file(
        os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt"),
        id_type=int,
    )
    classes = list(range(100))
    ma = pairwise_matrices(ours, classes)
    mb = pairwise_matrices(ref, classes)
    assert np.array_equal(ma["lcs_height"], mb["lcs_height"])
    assert np.array_equal(ma["wup"], mb["wup"])


def test_inat_edges(tmp_path):
    import json

    data = {
        "categories": [
            {"supercategory": "Aves", "kingdom": "Animalia", "phylum": "Chordata",
             "class": "Aves", "order": "O1", "family": "F1", "genus": "G1",
             "id": 1},
            {"supercategory": "Plantae", "kingdom": "Plantae", "phylum": "P2",
             "class": "C2", "order": "O2", "family": "F2", "genus": "G2",
             "id": 2},
        ]
    }
    p = tmp_path / "train.json"
    p.write_text(json.dumps(data))
    pairs = inat_edges(str(p))
    assert ("__NULL__", "Animalia") in pairs
    assert ("G1", 1) in pairs
    only_aves = inat_edges(str(p), supercategory="Aves")
    assert all("G2" not in pair for pair in only_aves)
