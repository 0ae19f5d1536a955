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


def test_conv_bias_folds_into_bn_mean(tmp_path):
    """BN-fed convs are bias-free here; an imported Keras conv bias must be
    folded into the following BN's moving mean (mean - bias), which yields
    the identical normalized output.  Importing (bias=b, mean=m) must
    produce the exact same checkpoint as importing (bias=0, mean=m-b)."""
    rng = np.random.default_rng(7)

    def build(bias, mean):
        layers = {"conv0": [_conv(16)[0], bias], "bn0": _bn(16)}
        layers["bn0"][2] = mean
        filters = {1: (16, 16), 2: (16, 32), 3: (32, 64)}
        for s, (fin, fout) in filters.items():
            for b in range(1, 6):
                cin = fin if b == 1 else fout
                layers[f"res{s}-{b}x"] = _conv(fout, cin)
                layers[f"bn{s}-{b}x"] = _bn(fout)
                layers[f"res{s}-{b}y"] = _conv(fout, fout)
                layers[f"bn{s}-{b}y"] = _bn(fout)
        return layers

    b = rng.normal(size=16).astype(np.float32)
    m = rng.normal(size=16).astype(np.float32)

    from semantic_embeddings_tpu.cli.import_keras_weights import map_layers

    p1, bs1, _ = map_layers(build(b, m), "resnet-32")
    p2, bs2, _ = map_layers(build(np.zeros(16, np.float32), m - b),
                            "resnet-32")

    def flat(t):
        return {k: v for k, v in _flatten(t).items()}

    f1, f2 = flat(p1), flat(p2)
    assert set(f1) == set(f2)
    assert not any(k.endswith("conv0/bias") for k in f1)
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
    np.testing.assert_allclose(
        _flatten(bs1)["backbone/bn0/BatchNorm_0/mean"],
        _flatten(bs2)["backbone/bn0/BatchNorm_0/mean"], rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        _flatten(bs1)["backbone/bn0/BatchNorm_0/mean"], m - b)


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


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


@pytest.mark.parametrize("arch", [
    "wrn-28-10", "pyramidnet-110-270", "pyramidnet-272-200",
    "densenet-100-12", "densenet-bc-190-40",
])
def test_ordered_family_import_covers_model(arch):
    """WRN/PyramidNet/DenseNet reference models leave inner layers unnamed;
    the importer maps them by h5 order. Validate the generated order against
    the real model: every backbone parameter must be assigned, with the
    right shape (uses eval_shape — no compute)."""
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.cli.import_keras_weights import (
        _ORDERED_FAMILIES, map_layers)
    from semantic_embeddings_tpu.models import build_network

    spec = build_network(32, arch)
    shapes = jax.eval_shape(
        lambda: spec.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
    )
    p_model = _flatten({"backbone": jax.tree_util.tree_map(
        lambda x: x.shape, shapes["params"])})
    bs_model = _flatten({"backbone": jax.tree_util.tree_map(
        lambda x: x.shape, shapes["batch_stats"])})

    # Synthesize the h5 layer dict in reference creation order with the
    # model's own shapes (inverse of the mapping under test).
    conv_paths, bn_paths = _ORDERED_FAMILIES[arch]()
    params_tree = shapes["params"]

    def node(path):
        n = params_tree
        for part in path.split("/"):
            n = n[part]
        return n

    layers = {}
    for i, path in enumerate(conv_paths):
        n = node(path)
        w = [np.zeros(n["kernel"].shape, np.float32)]
        if "bias" in n:
            w.append(np.zeros(n["bias"].shape, np.float32))
        elif arch.startswith("pyramidnet"):
            # The reference PyramidNet h5 carries (dead) conv biases — ours
            # are bias-free and the importer folds them into the BN mean.
            w.append(np.zeros(n["kernel"].shape[-1], np.float32))
        layers[f"conv2d_{i + 1}"] = w
    for i, path in enumerate(bn_paths):
        c = node(path)["BatchNorm_0"]["scale"].shape
        layers[f"batch_normalization_{i + 1}"] = [
            np.ones(c, np.float32), np.zeros(c, np.float32),
            np.zeros(c, np.float32), np.ones(c, np.float32)]
    # named top/bn4 per family
    top_shape = params_tree["top"]["kernel"].shape
    if arch.startswith("densenet"):
        layers["dense_1"] = [np.zeros(top_shape, np.float32),
                             np.zeros(top_shape[1], np.float32)]
    else:
        layers["embedding"] = [np.zeros(top_shape, np.float32),
                               np.zeros(top_shape[1], np.float32)]
    if arch.startswith("pyramidnet"):
        c = params_tree["bn_final"]["BatchNorm_0"]["scale"].shape
        layers["bn4"] = [np.ones(c, np.float32), np.zeros(c, np.float32),
                         np.zeros(c, np.float32), np.ones(c, np.float32)]
        # conv0/bn0 are NAMED in the reference pyramidnet (unlike WRN);
        # its h5 carries a (dead) conv0 bias that the importer folds.
        n = params_tree["conv0"]
        layers["conv0"] = [np.zeros(n["kernel"].shape, np.float32),
                           np.zeros(n["kernel"].shape[-1], np.float32)]
        c0 = params_tree["bn0"]["BatchNorm_0"]["scale"].shape
        layers["bn0"] = [np.ones(c0, np.float32), np.zeros(c0, np.float32),
                         np.zeros(c0, np.float32), np.ones(c0, np.float32)]

    params, batch_stats, skipped = map_layers(layers, arch)
    assert skipped == []
    p_got = _flatten(params)
    bs_got = _flatten(batch_stats)
    assert set(p_got) == set(p_model), (
        sorted(set(p_model) - set(p_got))[:5],
        sorted(set(p_got) - set(p_model))[:5],
    )
    assert set(bs_got) == set(bs_model)
    for k in p_got:
        assert tuple(p_got[k].shape) == tuple(p_model[k]), k


def test_ordered_family_count_mismatch_raises():
    from semantic_embeddings_tpu.cli.import_keras_weights import map_layers

    layers = {"conv2d_1": [np.zeros((3, 3, 3, 16), np.float32)]}
    with pytest.raises(ValueError, match="expected .* unnamed convs"):
        map_layers(layers, "wrn-28-10")
