"""Reverse ``.h5`` exporter: structure + import/export round-trip (fast).

The exporter (``cli/export_keras_weights.py``) inverts the importer by
construction (sentinel mapping), so these tests focus on the properties
that inversion cannot guarantee by itself: full weight coverage for every
architecture x cls-head combination, Keras-format well-formedness of the
written HDF5, and bit-identical export -> import round trips from real
model states.  Forward equality against the reference's own builders lives
in the slow oracle module (``test_keras_export_oracle.py``).
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from semantic_embeddings_tpu.cli._keras_layer_orders import LAYER_ORDERS
from semantic_embeddings_tpu.cli.export_keras_weights import (
    _WEIGHT_NAMES,
    _invert_importer,
    export_layers,
    layer_template,
    write_keras_h5,
)
from semantic_embeddings_tpu.cli.import_keras_weights import (
    map_layers,
    read_keras_h5,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


@pytest.mark.parametrize("cls_classes", [0, 10])
@pytest.mark.parametrize("arch", sorted(LAYER_ORDERS))
def test_template_inverts_fully(arch, cls_classes):
    """Every weight of every exportable architecture gets a reverse
    mapping (or is a deliberately-dropped dead conv bias)."""
    template = layer_template(arch, cls_classes)
    reverse = _invert_importer(template, arch, cls_classes)
    total = sum(len(_WEIGHT_NAMES[k]) for _, k in template)
    dropped = total - len(reverse)
    # dropped weights are exactly the fold-family conv biases
    from semantic_embeddings_tpu.cli.export_keras_weights import (
        _fold_architecture,
    )

    expect_dropped = (
        sum(1 for _, k in template if k == "C")
        if _fold_architecture(arch)
        else 0
    )
    assert dropped == expect_dropped, (arch, dropped, expect_dropped)


def test_unsupported_architecture_raises():
    # nasnet-a gained export support in r4; rn* stays unsupported
    # (keras-resnet naming is not oracle-verifiable here)
    with pytest.raises(ValueError, match="does not support"):
        layer_template("rn50")


def _our_variables(arch, embed_dim, cls_classes, seed=0):
    import flax
    import jax

    from semantic_embeddings_tpu.cli import common

    model, spec = common.build_embedding_model(
        embed_dim, arch, "inv_corr", cls_classes
    )
    state = common.init_model_state(model, spec.input_size, 3, seed=seed)
    # randomize batch stats so round trips can't pass on init constants
    rng = np.random.default_rng(seed + 1)
    bs = jax.tree_util.tree_map(
        lambda x: rng.normal(1.0, 0.1, x.shape).astype(np.float32),
        flax.core.unfreeze(state.batch_stats),
    )
    return {
        "params": flax.core.unfreeze(state.params),
        "batch_stats": bs,
    }


@pytest.mark.parametrize("arch,embed_dim,cls_classes", [
    ("simple", 16, 0),
    ("simple", 16, 10),
    ("resnet-32", 16, 0),
])
def test_export_import_roundtrip_bitparity(arch, embed_dim, cls_classes,
                                           tmp_path):
    """export -> Keras h5 -> import reproduces params AND batch stats
    bit-for-bit (zero biases fold to a no-op, so fold families round-trip
    exactly too)."""
    variables = _our_variables(arch, embed_dim, cls_classes)
    layers = export_layers(variables, arch, cls_classes)
    path = str(tmp_path / "export.h5")
    write_keras_h5(path, layers)

    re_layers = read_keras_h5(path)
    params, batch_stats, skipped = map_layers(
        re_layers, arch, has_cls_head=cls_classes > 0
    )
    assert skipped == []
    ours_p, ours_bs = _flatten(variables["params"]), _flatten(
        variables["batch_stats"])
    got_p, got_bs = _flatten(params), _flatten(batch_stats)
    assert set(got_p) == set(ours_p)
    assert set(got_bs) == set(ours_bs)
    for k in ours_p:
        np.testing.assert_array_equal(got_p[k], ours_p[k], err_msg=k)
    for k in ours_bs:
        np.testing.assert_array_equal(got_bs[k], ours_bs[k], err_msg=k)


def test_h5_format_is_keras_save_weights_shaped(tmp_path):
    """Root/layer attrs and dataset paths match what Keras' h5 reader (and
    our own read_keras_h5) expect."""
    variables = _our_variables("simple", 16, 0)
    layers = export_layers(variables, "simple", 0)
    path = str(tmp_path / "fmt.h5")
    write_keras_h5(path, layers)
    with h5py.File(path, "r") as f:
        names = [n.decode() for n in f.attrs["layer_names"]]
        assert names[0] == "conv1" and names[-1] == "embedding"
        backend = f.attrs["backend"]
        backend = backend.decode() if isinstance(backend, bytes) else backend
        assert backend == "tensorflow"
        g = f["conv1"]
        wn = [w.decode() for w in g.attrs["weight_names"]]
        assert wn == ["conv1/kernel:0", "conv1/bias:0"]
        assert g["conv1/kernel:0"].shape == (3, 3, 3, 64)
        bn = f["bn1"]
        assert [w.decode() for w in bn.attrs["weight_names"]] == [
            "bn1/gamma:0", "bn1/beta:0", "bn1/moving_mean:0",
            "bn1/moving_variance:0",
        ]


def test_cli_export_from_checkpoint(tmp_path):
    """The CLI reads architecture/cls metadata from a checkpoint dump and
    writes the h5."""
    import flax

    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.export_keras_weights import main
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 10)
    state = common.init_model_state(model, spec.input_size, 3, seed=0)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 10,
    })
    out = str(tmp_path / "m.h5")
    main(["--model", ckpt, "--out", out])
    re_layers = read_keras_h5(out)
    assert "prob" in re_layers and "embedding" in re_layers
    params, _, skipped = map_layers(re_layers, "simple", has_cls_head=True)
    assert skipped == []
    ours = _flatten(flax.core.unfreeze(state.params))
    got = _flatten(params)
    assert set(got) == set(ours)
    for k in ours:
        np.testing.assert_array_equal(got[k], np.asarray(ours[k]), err_msg=k)
