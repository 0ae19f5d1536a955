"""Regenerates ``semantic_embeddings_tpu/cli/_keras_layer_orders.py``.

Builds every exportable architecture with the REFERENCE'S OWN builders
(``/root/reference/utils.py::build_network``) under tf_keras and records the
``model.layers`` order of weight-bearing layers — the order Keras
``save_weights`` writes and positional ``load_weights`` consumes.  The
recorded tables are the ground truth for ``export_keras_weights``; the
oracle test (``tests/test_keras_export_oracle.py``) re-derives them live and
asserts the committed module is current.

resnet-50 names are converted from tf_keras's new ``conv{S}_block{B}_{i}_*``
convention back to the Keras-2.2 ``res{S}{letter}_branch{2a,2b,2c,1}`` names
used by the reference's published ``.h5`` files (and by our importer).

Run from the repo root:  python tools/gen_keras_layer_orders.py
"""

import os
import re
import sys

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# APPEND, do not insert at 0: this module is also imported mid-suite by
# tests/test_keras_export_oracle.py, and prepending the repo root there
# would shadow the reference checkout's top-level modules (learn_*.py)
# for every later bare-name reference import (the repo root hosts
# same-named entry-point shims).
for _p in (os.path.join(REPO, "tests"), REPO):
    if _p not in sys.path:
        sys.path.append(_p)

ARCHS = [
    "simple",
    "resnet-32",
    "resnet-110",
    "resnet-110-fc",
    "resnet-110-wfc",
    "resnet-50",
    # resnet-101/152 come from keras_applications.resnet (resnet_common):
    # their h5 files use the MODERN conv{S}_block{N}_{i}_* names directly
    # (no Keras-2.2 translation), which the importer maps natively.
    "resnet-101",
    "resnet-152",
    "wrn-28-10",
    "pyramidnet-272-200",
    "pyramidnet-110-270",
    "densenet-100-12",
    "densenet-100-24",
    "densenet-bc-190-40",
    "nasnet-a",
]

_RN50_CONV = re.compile(r"conv(\d)_block(\d+)_(\d)_conv")
_RN50_BN = re.compile(r"conv(\d)_block(\d+)_(\d)_bn")
_BRANCH = {"1": "branch2a", "2": "branch2b", "3": "branch2c", "0": "branch1"}


def to_keras22_name(name):
    """tf_keras applications ResNet50 names -> Keras-2.2 published names."""
    if name == "conv1_conv":
        return "conv1"
    if name == "conv1_bn":
        return "bn_conv1"
    m = _RN50_CONV.fullmatch(name)
    if m:
        s, b, i = m.groups()
        return f"res{s}{chr(ord('a') + int(b) - 1)}_{_BRANCH[i]}"
    m = _RN50_BN.fullmatch(name)
    if m:
        s, b, i = m.groups()
        return f"bn{s}{chr(ord('a') + int(b) - 1)}_{_BRANCH[i]}"
    return name


def layer_entry(layer):
    kind = type(layer).__name__
    if kind == "SeparableConv2D":
        assert not layer.use_bias, layer.name  # nasnet sepconvs: bias-free
        return (layer.name, "S")
    if kind == "Conv2D":
        return (layer.name, "C" if layer.use_bias else "c")
    if kind == "BatchNormalization":
        return (layer.name, "B")
    if kind == "Dense":
        return (layer.name, "D" if layer.use_bias else "d")
    raise ValueError(f"unhandled weight-bearing layer type {kind} "
                     f"({layer.name})")


def record_orders():
    import tf_keras

    from test_keras_import_oracle import _install_keras2_shims

    _install_keras2_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import utils as ref_utils

    orders = {}
    for arch in ARCHS:
        tf_keras.backend.clear_session()
        km = ref_utils.build_network(16, arch)
        entries = [layer_entry(l) for l in km.layers if l.weights]
        if arch == "resnet-50":
            entries = [(to_keras22_name(n), k) for n, k in entries]
        orders[arch] = entries
    return orders


HEADER = '''"""Keras layer order tables for ``export_keras_weights`` (GENERATED).

For each architecture: the weight-bearing layers of the reference's own
builder (``/root/reference/utils.py::build_network`` executed under
tf_keras), in ``model.layers`` order — the order Keras ``save_weights``
writes and positional ``load_weights`` consumes.  Entries are
``(layer_name, kind)`` with kind ``C``/``c`` = Conv2D with/without bias,
``B`` = BatchNormalization, ``D``/``d`` = Dense with/without bias.

resnet-50 uses the Keras-2.2 published names (``res2a_branch2a`` ...), see
``tools/gen_keras_layer_orders.py`` (the generator; re-run it to refresh)
and ``tests/test_keras_export_oracle.py`` (asserts these tables match the
live builders).  Do not edit by hand.
"""

# fmt: off
LAYER_ORDERS = {
'''


def main():
    orders = record_orders()
    out = [HEADER]
    for arch, entries in orders.items():
        out.append(f"    {arch!r}: [\n")
        line = "       "
        for e in entries:
            frag = f" ({e[0]!r}, {e[1]!r}),"
            if len(line) + len(frag) > 78:
                out.append(line + "\n")
                line = "       "
            line += frag
        out.append(line + "\n    ],\n")
    out.append("}\n# fmt: on\n")
    dest = os.path.join(
        REPO, "semantic_embeddings_tpu", "cli", "_keras_layer_orders.py"
    )
    with open(dest, "w") as f:
        f.write("".join(out))
    n = sum(len(v) for v in orders.values())
    print(f"wrote {dest}: {len(orders)} architectures, {n} layers")


if __name__ == "__main__":
    main()
