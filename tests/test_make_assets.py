"""tools/make_assets.py: one-command materialization of the reference's
data-asset layer (SURVEY.md §2.6) with built-in golden verification.

Each group's builder ASSERTS its own parity internally (edge lists
similarity-identical, unitsphere pickles elementwise-equal to the shipped
goldens, approx_sim pickles at most the reference's approximation error,
class-index jsons label/name-identical) — these tests drive the tool and
check the manifest bookkeeping on top.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import make_assets


def _run(reference_dir, tmp_path, only):
    out = str(tmp_path / "assets")
    make_assets.main(["--reference", reference_dir, "--out", out,
                      "--only", only])
    with open(os.path.join(out, "MANIFEST.json")) as f:
        manifest = json.load(f)["entries"]
    for entry in manifest:
        assert os.path.isfile(os.path.join(out, entry["path"]))
        assert entry["bytes"] > 0
        assert len(entry["sha256"]) == 64
    return out, manifest


def test_cifar_assets_golden(reference_dir, tmp_path):
    out, manifest = _run(reference_dir, tmp_path, "cifar")
    derived = {e["path"]: e for e in manifest if e["kind"] == "derived"}
    assert "Cifar-Hierarchy/cifar.parent-child.txt" in derived
    pkl = derived["embeddings/cifar100.unitsphere.pickle"]
    assert pkl["verification"]["max_elementwise_delta"] < 1e-12

    with open(os.path.join(out, "embeddings",
                           "cifar100.unitsphere.pickle"), "rb") as f:
        ours = pickle.load(f)
    with open(os.path.join(reference_dir, "embeddings",
                           "cifar100.unitsphere.pickle"), "rb") as f:
        ref = pickle.load(f)
    assert ours["ind2label"] == list(ref["ind2label"])
    assert np.abs(ours["embedding"] - ref["embedding"]).max() < 1e-12


def test_cub_assets_golden(reference_dir, tmp_path):
    _, manifest = _run(reference_dir, tmp_path, "cub")
    derived = [e for e in manifest if e["kind"] == "derived"]
    # 3 edge lists + 3 unitsphere pickles
    assert len(derived) == 6
    for e in derived:
        if e["path"].endswith(".pickle"):
            assert e["verification"]["max_elementwise_delta"] < 1e-12


def test_nab_assets_golden(reference_dir, tmp_path):
    out, manifest = _run(reference_dir, tmp_path, "nab")
    by_path = {e["path"]: e for e in manifest}
    uni = by_path["embeddings/nab.unitsphere.pickle"]
    assert uni["verification"]["max_elementwise_delta"] < 1e-12
    # the class-index json row order is deterministic for int ids and must
    # be byte-identical to the shipped one
    ci = by_path["NAB-Hierarchy/nab_class_index.unitsphere.json"]
    assert ci["verification"]["status"] == "identical to reference json"
    # every approx_sim pickle achieves at most the reference's error
    for dim in (8, 16, 32, 64, 128, 256):
        e = by_path[f"embeddings/nab.sim{dim}_unnormed.pickle"]
        v = e["verification"]
        assert v["approx_error_ours"] <= v["approx_error_reference"] + 1e-9
    # --norm keeps zero rows zero (the shipped nab.sim8.pickle convention)
    # instead of NaN-poisoning them like a literal `E /= norm(E)` would
    with open(os.path.join(out, "embeddings", "nab.sim8.pickle"), "rb") as f:
        e8 = pickle.load(f)["embedding"]
    norms = np.linalg.norm(e8, axis=1)
    assert not np.isnan(e8).any()
    assert ((norms == 0.0) | (np.abs(norms - 1.0) < 1e-9)).all()
    # rows that are EXACTLY zero pre-norm stay zero (the shipped
    # nab.sim8.pickle has 23 such rows — same convention)
    with open(os.path.join(out, "embeddings",
                           "nab.sim8_unnormed.pickle"), "rb") as f:
        e8u = pickle.load(f)["embedding"]
    assert ((norms == 0.0) == (np.linalg.norm(e8u, axis=1) == 0.0)).all()
    assert (norms == 0.0).sum() > 0


def test_ilsvrc_assets(reference_dir, tmp_path):
    out, manifest = _run(reference_dir, tmp_path, "ilsvrc")
    by_path = {e["path"]: e for e in manifest}
    pkl = by_path["embeddings/imagenet_mintree.unitsphere.pickle"]
    assert pkl["verification"]["solver_deviation"] < 1e-9
    # label/name map equality with the shipped json (row order is a fresh
    # permutation; the reference's own order is PYTHONHASHSEED-dependent)
    with open(os.path.join(out, "ILSVRC",
                           "imagenet_class_index.unitsphere.json")) as f:
        ours = json.load(f)
    with open(os.path.join(reference_dir, "ILSVRC",
                           "imagenet_class_index.unitsphere.json")) as f:
        ref = json.load(f)
    assert {tuple(v) for v in ours.values()} == {tuple(v) for v in ref.values()}
    # and the json must be consistent with OUR pickle's row order
    with open(os.path.join(out, "embeddings",
                           "imagenet_mintree.unitsphere.pickle"), "rb") as f:
        data = pickle.load(f)
    assert [ours[str(i)][0] for i in range(len(data["ind2label"]))] == list(
        data["ind2label"])


def test_inat_sources_only(reference_dir, tmp_path):
    # without --full only the source copies are materialized
    _, manifest = _run(reference_dir, tmp_path, "inat")
    assert all(e["kind"] == "source-copy" for e in manifest)


@pytest.mark.slow
def test_inat_assets_full(reference_dir, tmp_path):
    """Regenerates the two mirror-stripped iNat blobs (8142-class eigh,
    ~90 s) and checks the class-index json label/name parity."""
    out = str(tmp_path / "assets")
    make_assets.main(["--reference", reference_dir, "--out", out,
                      "--only", "inat", "--full"])
    with open(os.path.join(out, "MANIFEST.json")) as f:
        manifest = json.load(f)["entries"]
    by_path = {e["path"]: e for e in manifest}
    assert "embeddings/inat.sim1024.pickle" in by_path
    assert "embeddings/inat2019.pickle" in by_path
    ci = by_path["iNaturalist-Hierarchy/inat_class_index.unitsphere.json"]
    assert "same label/name map" in ci["verification"]["status"]
    with open(os.path.join(out, "embeddings", "inat.sim1024.pickle"),
              "rb") as f:
        data = pickle.load(f)
    assert np.asarray(data["embedding"]).shape == (8142, 1024)


def test_unknown_group_rejected(reference_dir, tmp_path):
    with pytest.raises(SystemExit):
        make_assets.main(["--reference", reference_dir,
                          "--out", str(tmp_path / "x"), "--only", "bogus"])
