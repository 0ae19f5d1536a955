"""Reverse exporter validated against the REFERENCE's own model code (slow).

Certifies the full interop circle the exporter exists for
(``/root/reference/utils.py:422-465`` loading, ``learn_image_embeddings.py:
257-267`` dumps): a Keras model with RANDOM NONZERO conv biases is saved by
the reference's own builder, imported (which folds dead conv biases into BN
means), exported back to ``.h5``, and loaded into a FRESH instance of the
reference's builder with positional ``load_weights`` — then all three
forwards must agree:

    original Keras  ==  ours (imported)  ==  fresh Keras (our export)

Positional loading is exactly what the reference's evaluation stack does
for weight files, so this also pins the ``model.layers`` order tables in
``_keras_layer_orders.py`` (additionally re-derived live and diffed).

The reference implementation is imported as an oracle only (sanctioned in
CLAUDE.md); nothing from it ships at runtime.
"""

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")
h5py = pytest.importorskip("h5py")

from test_keras_import_oracle import (  # noqa: E402
    _forward_ours,
    _randomize_weights,
    ref_utils,  # noqa: F401  (fixture re-export)
)

from semantic_embeddings_tpu.cli.export_keras_weights import (  # noqa: E402
    export_layers,
    write_keras_h5,
)
from semantic_embeddings_tpu.cli.import_keras_weights import (  # noqa: E402
    map_layers,
    read_keras_h5,
)

pytestmark = pytest.mark.slow


def _export_circle(ref_utils, arch, embed_dim, tmp_path, input_hw=32,
                   atol=2e-4):
    tf_keras.backend.clear_session()
    km = ref_utils.build_network(embed_dim, arch)
    _randomize_weights(km, seed=hash("export-" + arch) % 2**31)
    h5_orig = str(tmp_path / f"{arch}.orig.h5")
    km.save_weights(h5_orig)

    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 1.0, (2, input_hw, input_hw, 3)).astype(np.float32)
    y_orig = km.predict(x, verbose=0)

    # import (folds nonzero conv biases into BN means for fold families)
    params, batch_stats, skipped = map_layers(read_keras_h5(h5_orig), arch)
    assert skipped == []
    y_ours = _forward_ours(arch, h5_orig, embed_dim, x)

    # export from the imported trees and load into a FRESH reference model
    h5_export = str(tmp_path / f"{arch}.export.h5")
    # map_layers nests everything under 'backbone' (its default), which is
    # exactly the checkpoint layout export_layers expects
    write_keras_h5(
        h5_export,
        export_layers({"params": params, "batch_stats": batch_stats}, arch),
    )
    tf_keras.backend.clear_session()
    km2 = ref_utils.build_network(embed_dim, arch)
    km2.load_weights(h5_export)  # positional: the reference's load path
    y_export = km2.predict(x, verbose=0)

    scale = max(1e-3, float(np.abs(y_orig).max()))
    np.testing.assert_allclose(
        y_ours, y_orig, rtol=0, atol=atol * scale,
        err_msg=f"{arch}: import forward diverged",
    )
    np.testing.assert_allclose(
        y_export, y_orig, rtol=0, atol=atol * scale,
        err_msg=f"{arch}: export->reference-load forward diverged",
    )
    # export is deterministic and bit-stable across a second round trip
    params2, batch_stats2, skipped2 = map_layers(
        read_keras_h5(h5_export), arch)
    assert skipped2 == []

    def flat(t, p=()):
        out = {}
        for k, v in t.items():
            out.update(flat(v, p + (k,)) if isinstance(v, dict)
                       else {p + (k,): np.asarray(v)})
        return out

    f1, f2 = flat(params), flat(params2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k], err_msg=str(k))


@pytest.mark.parametrize("arch,embed_dim", [
    ("simple", 16),
    ("resnet-110-wfc", 100),
    ("wrn-28-10", 100),
    ("densenet-100-12", 100),
    ("pyramidnet-110-270", 100),
])
def test_export_reference_load_forward_parity(ref_utils, arch, embed_dim,
                                              tmp_path):
    _export_circle(ref_utils, arch, embed_dim, tmp_path)


def test_export_reference_load_forward_parity_resnet101(ref_utils, tmp_path):
    """resnet-101 interop circle (keras_applications.resnet naming; 152
    shares the identical code path with different block counts).  64px:
    the builder is size-polymorphic, same weights/wiring as 224."""
    _export_circle(ref_utils, "resnet-101", 100, tmp_path, input_hw=64,
                   atol=3e-4)


def test_export_reference_load_forward_parity_nasnet_a(ref_utils, tmp_path):
    """nasnet-a interop circle: import (SeparableConv2D depthwise-kernel
    transpose) -> export -> fresh keras NASNetLarge positional
    load_weights -> forward equality.  224px: the reference's builder
    hardcodes the input size (utils.py:270)."""
    _export_circle(ref_utils, "nasnet-a", 100, tmp_path, input_hw=224,
                   atol=1e-3)


def test_layer_order_tables_are_current(ref_utils):
    """The committed ``_keras_layer_orders.py`` matches the live
    ``model.layers`` order of the reference's builders (regenerate with
    ``tools/gen_keras_layer_orders.py`` if this ever fails)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from gen_keras_layer_orders import record_orders

    from semantic_embeddings_tpu.cli._keras_layer_orders import LAYER_ORDERS

    live = record_orders()
    assert set(live) == set(LAYER_ORDERS)
    for arch, entries in live.items():
        assert entries == list(LAYER_ORDERS[arch]), arch
