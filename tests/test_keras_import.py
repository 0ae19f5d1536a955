"""Keras .h5 weight importer: synthetic Keras-layout files round-trip."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from semantic_embeddings_tpu.cli.import_keras_weights import main, read_keras_h5


def _write_keras_h5(path, layer_weights):
    """Writes a Keras `save_weights`-layout HDF5 file."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_weights], dtype="S"
        )
        for lname, weights in layer_weights.items():
            g = f.create_group(lname)
            wnames = []
            for i, w in enumerate(weights):
                wn = f"{lname}/w_{i}:0"
                g.create_dataset(wn, data=w)
                wnames.append(wn.encode())
            g.attrs["weight_names"] = np.array(wnames, dtype="S")


def _conv(o, i=3, k=3):
    rng = np.random.default_rng(hash((o, i, k)) % 2**31)
    return [rng.normal(size=(k, k, i, o)).astype(np.float32),
            np.zeros(o, np.float32)]


def _bn(c):
    return [np.ones(c, np.float32), np.zeros(c, np.float32),
            np.zeros(c, np.float32), np.ones(c, np.float32)]


def test_small_resnet_import(tmp_path):
    # resnet-32: n=5 blocks/stage, filters (16, 32, 64), embed head 16-d,
    # cls head 4 classes.
    layers = {"conv0": _conv(16), "bn0": _bn(16)}
    filters = {1: (16, 16), 2: (16, 32), 3: (32, 64)}
    for s, (fin, fout) in filters.items():
        for b in range(1, 6):
            cin = fin if b == 1 else fout
            layers[f"res{s}-{b}x"] = _conv(fout, cin)
            layers[f"bn{s}-{b}x"] = _bn(fout)
            layers[f"res{s}-{b}y"] = _conv(fout, fout)
            layers[f"bn{s}-{b}y"] = _bn(fout)
    # resnet-32 embedding models have no top dense (include_top only with
    # classification, utils.py:162-166): the cls head sits on the pooled
    # 64-d features.
    rng = np.random.default_rng(0)
    layers["prob"] = [rng.normal(size=(64, 4)).astype(np.float32),
                      np.zeros(4, np.float32)]
    layers["batch_normalization_1"] = _bn(64)

    h5 = str(tmp_path / "ref.h5")
    _write_keras_h5(h5, layers)
    out = str(tmp_path / "imported.ckpt")
    main([
        "--h5", h5, "--architecture", "resnet-32", "--embed_dim", "64",
        "--cls_classes", "4", "--out", out,
    ])

    from semantic_embeddings_tpu.train.state import load_checkpoint_raw

    variables, meta = load_checkpoint_raw(out)
    assert meta["architecture"] == "resnet-32"
    p = variables["params"]
    np.testing.assert_array_equal(
        p["backbone"]["conv0"]["kernel"], layers["conv0"][0]
    )
    np.testing.assert_array_equal(
        p["backbone"]["stage2_block3"]["conv_b"]["kernel"],
        layers["res2-3y"][0],
    )
    np.testing.assert_array_equal(
        p["cls_top"]["kernel"], layers["prob"][0]
    )
    bs = variables["batch_stats"]
    np.testing.assert_array_equal(
        bs["backbone"]["bn0"]["BatchNorm_0"]["var"], layers["bn0"][3]
    )
    np.testing.assert_array_equal(
        bs["cls_bn"]["BatchNorm_0"]["mean"], layers["batch_normalization_1"][2]
    )


def test_shape_mismatch_raises(tmp_path):
    layers = {"conv0": _conv(99)}  # wrong width
    h5 = str(tmp_path / "bad.h5")
    _write_keras_h5(h5, layers)
    with pytest.raises(ValueError, match="Shape mismatch"):
        main([
            "--h5", h5, "--architecture", "resnet-32", "--embed_dim", "16",
            "--out", str(tmp_path / "x.ckpt"),
        ])


def test_model_weights_group_layout(tmp_path):
    """Full-model saves nest everything under 'model_weights'."""
    inner = {"conv0": _conv(16), "bn0": _bn(16)}
    path = str(tmp_path / "full.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = np.array([b"conv0", b"bn0"], dtype="S")
        for lname, weights in inner.items():
            lg = g.create_group(lname)
            wnames = []
            for i, w in enumerate(weights):
                wn = f"{lname}/w_{i}:0"
                lg.create_dataset(wn, data=w)
                wnames.append(wn.encode())
            lg.attrs["weight_names"] = np.array(wnames, dtype="S")
    layers = read_keras_h5(path)
    assert set(layers) == {"conv0", "bn0"}
    np.testing.assert_array_equal(layers["conv0"][0], inner["conv0"][0])
