"""CLI wiring of --gpus / --db_sharded on evaluate_retrieval.

The library path is equality-tested in test_multichip; this drives the
actual CLI flags end-to-end on the 8-device CPU mesh and asserts the
DB-sharded run reproduces the replicated run's metrics exactly.
"""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture()
def setup(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # a 3-level taxonomy over the synthetic-8 labels 0..7
    lines = []
    for mid, leaves in ((8, (0, 1)), (9, (2, 3)), (10, (4, 5)), (11, (6, 7))):
        lines += [f"12 {mid}"] + [f"{mid} {leaf}" for leaf in leaves]
    hier = str(tmp_path / "hier.txt")
    with open(hier, "w") as f:
        f.write("\n".join(lines))
    # learner-format feature dump aligned with synthetic-8's test labels:
    # class-clustered unit vectors + noise so rankings are non-trivial
    from semantic_embeddings_tpu.data import get_data_generator

    ds = get_data_generator("synthetic-8")
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, 16))
    feats = centers[np.asarray(ds.labels_test)] + 0.3 * rng.normal(
        size=(ds.num_test, 16))
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feat_path = str(tmp_path / "feat.pickle")
    with open(feat_path, "wb") as f:
        pickle.dump({"feat": {i: feats[i] for i in range(len(feats))}}, f)
    return hier, feat_path


def _run(hier, feat_path, extra):
    from semantic_embeddings_tpu.cli.evaluate_retrieval import main

    perf = main([
        "--dataset", "synthetic-8", "--data_root", "x",
        "--hierarchy", hier, "--feat", feat_path, "--norm", "1",
        "--plot_max", "10", "--no_ap", "--clip_ahp", "20",
    ] + extra)
    return next(iter(perf.values()))


def test_cli_db_sharded_equals_replicated(setup):
    hier, feat_path = setup
    replicated = _run(hier, feat_path, ["--gpus", "8"])
    sharded = _run(hier, feat_path, ["--gpus", "8", "--db_sharded"])
    assert replicated.keys() == sharded.keys()
    for k in replicated:
        assert sharded[k] == pytest.approx(replicated[k], abs=1e-6), k
    assert 0.0 < replicated["P@1 (LCS_HEIGHT)"] <= 1.0
