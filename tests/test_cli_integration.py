"""End-to-end CLI integration on synthetic data (slow)."""

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar100")
    rng = np.random.default_rng(0)

    def write(name, n):
        y = (np.arange(n) % 100).tolist()
        base = np.asarray(y)[:, None] * 2
        data = np.clip(
            rng.integers(0, 100, (n, 3072)) + base, 0, 255
        ).astype(np.uint8)
        with open(root / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": y}, f)

    write("train", 600)
    write("test", 200)
    return str(root)


@pytest.fixture(scope="module")
def embedding_pickle(reference_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("emb") / "emb.pickle")
    from semantic_embeddings_tpu.cli.compute_class_embedding import main

    main([
        "--hierarchy",
        os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt"),
        "--out", out, "--method", "unitsphere",
    ])
    return out


def test_full_pipeline(cifar_root, embedding_pickle, tmp_path):
    feat = str(tmp_path / "feat.pickle")
    snap = str(tmp_path / "snap.ckpt")
    log_dir = str(tmp_path / "logs")

    from semantic_embeddings_tpu.cli.learn_image_embeddings import main as learn

    learn([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--embedding", embedding_pickle, "--architecture", "simple",
        "--loss", "inv_corr", "--cls_weight", "0.1",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.02,2",
        "--batch_size", "100", "--feature_dump", feat,
        "--snapshot", snap, "--log_dir", log_dir, "--no_progress",
    ])
    assert os.path.exists(feat)
    assert os.path.exists(snap)
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    assert "emb_loss" in json.loads(lines[0])

    with open(feat, "rb") as f:
        dump = pickle.load(f)
    assert len(dump["feat"]) == 200
    np.testing.assert_allclose(
        np.linalg.norm(dump["feat"][0]), 1.0, rtol=1e-5
    )

    # Resume from snapshot for one more epoch.
    learn([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--embedding", embedding_pickle, "--architecture", "simple",
        "--loss", "inv_corr", "--cls_weight", "0.1",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.02,3",
        "--batch_size", "100", "--snapshot", snap,
        "--initial_epoch", "2", "--no_progress",
    ])

    # Retrieval evaluation over the dumped features.
    from semantic_embeddings_tpu.cli.evaluate_retrieval import main as evaluate

    perf = evaluate([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--hierarchy", "/root/reference/Cifar-Hierarchy/cifar.parent-child.txt",
        "--feat", feat, "--plot_max", "50",
    ])
    metrics = next(iter(perf.values()))
    assert 0.0 < metrics["P@1 (LCS_HEIGHT)"] <= 1.0
    assert 0.0 < metrics["AHP (WUP)"] <= 1.0


def test_classification_accuracy_modes(cifar_root, embedding_pickle, tmp_path):
    model_dump = str(tmp_path / "model.ckpt")
    from semantic_embeddings_tpu.cli.learn_image_embeddings import main as learn

    learn([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--embedding", embedding_pickle, "--architecture", "simple",
        "--loss", "inv_corr", "--cls_weight", "0.1",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.02,1",
        "--batch_size", "100", "--model_dump", model_dump, "--no_progress",
    ])
    from semantic_embeddings_tpu.cli.evaluate_classification_accuracy import (
        main as evaluate,
    )

    perf = evaluate([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--hierarchy",
        "/root/reference/Cifar-Hierarchy/cifar.parent-child.txt",
        "--batch_size", "50",
        "--model", model_dump, "--layer", "prob", "--prob_features", "1",
        "--label", "prob-mode",
        "--model", model_dump, "--layer", "l2norm",
        "--centroids", embedding_pickle, "--label", "centroid-mode",
        "--model", model_dump, "--layer", "avg_pool", "--prob_features", "0",
        "--centroids", "", "--label", "svm-mode",
    ])
    assert set(perf) == {"prob-mode", "centroid-mode", "svm-mode"}
    for res in perf.values():
        assert 0.0 <= res["Accuracy"] <= 1.0
        assert "Hierarchical Accuracy" in res


def test_baseline_learner_clis(cifar_root, embedding_pickle, tmp_path):
    """Every baseline learner CLI runs end-to-end on the synthetic CIFAR
    fixture: classifier (+label smoothing), DeViSE, label-embedding
    network, center loss with fixed semantic centroids."""
    from semantic_embeddings_tpu.cli.learn_classifier import main as classifier
    from semantic_embeddings_tpu.cli.learn_devise import main as devise
    from semantic_embeddings_tpu.cli.learn_labelembedding import main as labelembed
    from semantic_embeddings_tpu.cli.learn_center_loss import main as center

    common = ["--dataset", "cifar-100", "--data_root", cifar_root,
              "--batch_size", "100", "--no_progress"]

    classifier(common + [
        "--architecture", "simple", "--label_smoothing", "0.1",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.01,1",
        "--model_dump", str(tmp_path / "cls.ckpt"),
    ])
    assert os.path.exists(tmp_path / "cls.ckpt")

    devise(common + [
        "--embedding", embedding_pickle, "--architecture", "simple",
        "--init_epochs", "1", "--ft_epochs", "1",
        "--feature_dump", str(tmp_path / "devise_feat.pickle"),
    ])
    with open(tmp_path / "devise_feat.pickle", "rb") as f:
        assert len(pickle.load(f)["feat"]) == 200

    labelembed(common + [
        "--architecture", "simple", "--embed_dim", "32",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.01,1",
        "--model_dump", str(tmp_path / "le.ckpt"),
    ])
    assert os.path.exists(tmp_path / "le.ckpt")

    center(common + [
        "--architecture", "simple", "--centroids", embedding_pickle,
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.01,1",
        "--model_dump", str(tmp_path / "cl.ckpt"),
    ])
    assert os.path.exists(tmp_path / "cl.ckpt")


def test_plot_clis(cifar_root, embedding_pickle, reference_dir, tmp_path):
    """plot_recall_precision and plot_hierarchy produce output files."""
    rng = np.random.default_rng(0)
    emb = pickle.load(open(embedding_pickle, "rb"))
    feat = np.asarray(emb["embedding"], np.float32)[
        (np.arange(200) % 100)
    ] + 0.1 * rng.normal(size=(200, 100)).astype(np.float32)
    feat_p = str(tmp_path / "feat.pickle")
    with open(feat_p, "wb") as f:
        pickle.dump({"feat": dict(enumerate(feat))}, f)

    from semantic_embeddings_tpu.cli.plot_recall_precision import main as prp

    out_png = str(tmp_path / "rp.png")
    prp([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--feat", feat_p, "--label", "test", "--out", out_png,
    ])
    assert os.path.exists(out_png)

    from semantic_embeddings_tpu.cli.plot_hierarchy import main as ph

    out_svg = str(tmp_path / "tree.svg")
    ph([
        "--hierarchy",
        os.path.join(reference_dir, "Cifar-Hierarchy", "cifar.parent-child.txt"),
        "--out", out_svg,
    ])
    assert os.path.getsize(out_svg) > 1000


def test_spatial_cli(cifar_root, embedding_pickle, tmp_path):
    """--gpus 8 --spatial 4 through the full learner CLI: the (2, 4) mesh
    trains, validates, and dumps features identical in shape/normalization
    to the single-device path (numerical equality is pinned in
    tests/test_spatial.py; this exercises the CLI wiring end to end)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    feat = str(tmp_path / "feat_sp.pickle")

    from semantic_embeddings_tpu.cli.learn_image_embeddings import main as learn

    learn([
        "--dataset", "cifar-100", "--data_root", cifar_root,
        "--embedding", embedding_pickle, "--architecture", "simple",
        "--loss", "inv_corr", "--cls_weight", "0.1",
        "--lr_schedule", "SGD", "--sgd_schedule", "1:0.02,1",
        "--batch_size", "100", "--gpus", "8", "--spatial", "4",
        "--feature_dump", feat, "--no_progress",
    ])
    with open(feat, "rb") as f:
        dump = pickle.load(f)
    assert len(dump["feat"]) == 200
    np.testing.assert_allclose(
        np.linalg.norm(dump["feat"][0]), 1.0, rtol=1e-5)
