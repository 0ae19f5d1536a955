"""Keras ``.h5`` importer validated against the REFERENCE's own model code.

The order-based weight maps in ``cli/import_keras_weights.py`` encode the
reference's layer-creation order for WRN / PyramidNet / DenseNet
(``/root/reference/models/wide_residual_network.py:60-101``,
``cifar_pyramidnet.py:31-191``, ``DenseNet/densenet.py:562-661``).  This
module is the ground-truth check the maps were previously missing: it runs
the reference's OWN builders under ``tf_keras`` (the maintained Keras 2
implementation, same ``save_weights`` HDF5 writer and the same topological
layer ordering as the Keras 2.2 the reference used), saves a real weight
file with randomized weights, imports it, and asserts

1. every backbone parameter/stat of our Flax model is covered, and
2. the forward pass through our model with the imported weights matches
   the Keras model's inference output numerically (which simultaneously
   validates our architecture re-implementations layer by layer).

The reference implementation is imported as an oracle only (sanctioned in
CLAUDE.md); nothing from it ships at runtime.
"""

import os
import sys
import types

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")
h5py = pytest.importorskip("h5py")

REFERENCE_DIR = "/root/reference"


def _install_keras2_shims():
    """Alias ``keras`` -> ``tf_keras`` incl. the Keras-2.2-era submodule
    paths the reference model files import from."""
    L = tf_keras.layers
    mods = {"keras": tf_keras}
    for sub in (
        "backend", "layers", "models", "callbacks", "regularizers",
        "initializers", "utils", "applications", "optimizers", "losses",
        "activations", "constraints", "datasets", "preprocessing",
    ):
        if hasattr(tf_keras, sub):
            mods[f"keras.{sub}"] = getattr(tf_keras, sub)

    def shim(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        mods[name] = m
        return m

    src = tf_keras.src
    shim("keras.engine", Layer=L.Layer, InputSpec=L.InputSpec,
         get_source_inputs=tf_keras.utils.get_source_inputs)
    shim("keras.engine.topology",
         get_source_inputs=tf_keras.utils.get_source_inputs)
    shim("keras.layers.core", Dense=L.Dense, Dropout=L.Dropout,
         Activation=L.Activation, Reshape=L.Reshape)
    shim("keras.layers.convolutional", Conv2D=L.Conv2D, Convolution2D=L.Conv2D,
         Conv2DTranspose=L.Conv2DTranspose, UpSampling2D=L.UpSampling2D)
    shim("keras.layers.pooling", AveragePooling2D=L.AveragePooling2D,
         MaxPooling2D=L.MaxPooling2D,
         GlobalAveragePooling2D=L.GlobalAveragePooling2D,
         GlobalMaxPooling2D=L.GlobalMaxPooling2D)
    shim("keras.layers.merge", concatenate=L.concatenate, add=L.add)
    shim("keras.layers.normalization", BatchNormalization=L.BatchNormalization)
    lu = src.utils.layer_utils
    shim("keras.utils.layer_utils",
         # theano-kernel conversion: only used for loading published theano
         # weights, which this test never does
         convert_all_kernels_in_model=lambda model: None,
         convert_dense_weights_data_format=(
             lu.convert_dense_weights_data_format),
         get_source_inputs=tf_keras.utils.get_source_inputs)
    shim("keras.utils.data_utils", get_file=tf_keras.utils.get_file)
    shim("keras.utils.generic_utils",
         get_custom_objects=tf_keras.utils.get_custom_objects)
    cu = src.utils.conv_utils
    cu_shim = types.ModuleType("keras.utils.conv_utils")
    for attr in dir(cu):
        if not attr.startswith("__"):
            setattr(cu_shim, attr, getattr(cu, attr))
    if not hasattr(cu_shim, "normalize_data_format"):
        cu_shim.normalize_data_format = tf_keras.backend.normalize_data_format
    # Keras 2.2's normalize_tuple accepted zeros (PyramidNet pads channels
    # by (0, n) in its first block); modern tf_keras rejects them by default
    cu_shim.normalize_tuple = (
        lambda value, n, name, allow_zero=True: cu.normalize_tuple(
            value, n, name, allow_zero=allow_zero))
    mods["keras.utils.conv_utils"] = cu_shim
    # `from keras.utils import layer_utils, conv_utils`
    tf_keras.utils.layer_utils = mods["keras.utils.layer_utils"]
    tf_keras.utils.conv_utils = mods["keras.utils.conv_utils"]
    iu = src.applications.imagenet_utils
    shim("keras.applications.imagenet_utils",
         _obtain_input_shape=iu.obtain_input_shape,
         decode_predictions=iu.decode_predictions)
    # DenseNet/tensorflow_backend.py imports these two for its
    # depth_to_space helper (only exercised by DenseNetFCN's upsampling).
    # `from keras.backend import X` resolves via getattr on the real
    # tf_keras.backend module (its __name__ defeats the sys.modules
    # fallback), so set attributes there as well.
    tb = shim("keras.backend.tensorflow_backend")
    common = shim("keras.backend.common",
                  image_data_format=tf_keras.backend.image_data_format)
    tf_keras.backend.tensorflow_backend = tb
    tf_keras.backend.common = common
    # Keras-2.2-era `K.tf` alias (used by ChannelPadding's call and the
    # labelembed/center-loss graphs: K.tf.nn.log_softmax, K.tf.zeros)
    import tensorflow as tf

    tf_keras.backend.tf = tf
    # `from keras.preprocessing.image import ...` (reference datasets/
    # common.py:7) — tf_keras's preprocessing package is lazy, so register
    # the submodule explicitly for the learner-module imports.
    import importlib

    pi = importlib.import_module("tf_keras.preprocessing.image")
    pi_shim = types.ModuleType("keras.preprocessing.image")
    for attr in dir(pi):
        if not attr.startswith("__"):
            setattr(pi_shim, attr, getattr(pi, attr))
    # keras_preprocessing helper tf_keras dropped; the reference's ILSVRC
    # loader imports it at module scope (never called in these tests)
    import glob as _glob
    import re as _re

    pi_shim.list_pictures = lambda directory, ext=(
        "jpg", "jpeg", "bmp", "png", "ppm", "tif", "tiff"): [
        f for f in sorted(_glob.glob(os.path.join(directory, "**", "*"),
                                     recursive=True))
        if _re.search(r"\.(" + "|".join(ext) + r")$", f.lower())
    ]
    mods["keras_preprocessing"] = shim("keras_preprocessing")
    mods["keras_preprocessing.image"] = pi_shim
    mods["keras.preprocessing"] = importlib.import_module(
        "tf_keras.preprocessing")
    mods["keras.preprocessing.image"] = pi_shim
    # keras_applications shim: the reference builds resnet-101/152 from
    # keras_applications.resnet (utils.py:228-238).  tf_keras's
    # applications.resnet is the SAME resnet_common implementation
    # (identical layer names conv{S}_block{N}_{i}_*, BN eps 1.001e-5,
    # stride placement), so it stands in as the oracle builder.  The
    # reference's `keras_applications._KERAS_BACKEND = ...` assignments at
    # utils.py:10-13 land harmlessly on the shim module.
    ka = shim("keras_applications")
    ka.resnet = types.ModuleType("keras_applications.resnet")
    ka.resnet.ResNet101 = tf_keras.applications.ResNet101
    ka.resnet.ResNet152 = tf_keras.applications.ResNet152
    mods["keras_applications.resnet"] = ka.resnet
    sys.modules.update(mods)


@pytest.fixture(scope="module")
def ref_utils():
    _install_keras2_shims()
    # force-front: mid-session path churn must not shadow the reference
    if REFERENCE_DIR in sys.path:
        sys.path.remove(REFERENCE_DIR)
    sys.path.insert(0, REFERENCE_DIR)
    import utils as ref_utils_mod

    assert ref_utils_mod.__file__.startswith(REFERENCE_DIR)
    return ref_utils_mod


def _randomize_weights(km, seed):
    """Random weights everywhere so any transposed/shifted mapping breaks
    forward parity: BN scale/variance positive, everything else normal.
    Conv biases get nonzero values on purpose — they exercise the
    bias-into-BN-mean folding path of the importer."""
    rng = np.random.default_rng(seed)
    for layer in km.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        is_bn = layer.__class__.__name__ == "BatchNormalization"
        new = []
        for i, w in enumerate(ws):
            if is_bn and i in (0, 3):  # gamma, moving_variance
                new.append(rng.uniform(0.5, 1.5, w.shape).astype(np.float32))
            else:
                new.append(rng.normal(0.0, 0.05, w.shape).astype(np.float32))
        layer.set_weights(new)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def _merge_full(dst, src_tree, what):
    """Strict merge: every imported leaf must exist with the right shape,
    and EVERY model leaf must be covered by the import."""
    dst_flat = _flatten(dst)
    src_flat = _flatten(src_tree)
    missing = sorted(set(dst_flat) - set(src_flat))
    extra = sorted(set(src_flat) - set(dst_flat))
    assert not extra, f"{what}: imported leaves absent from model: {extra[:6]}"
    assert not missing, f"{what}: model leaves not covered: {missing[:6]}"
    for k, v in src_flat.items():
        # dst leaves are ShapeDtypeStructs (from eval_shape) or arrays;
        # both carry .shape
        assert tuple(v.shape) == tuple(dst_flat[k].shape), (
            f"{what}: shape mismatch at {k}: h5 {v.shape} vs model "
            f"{dst_flat[k].shape}"
        )
    return src_tree


def _forward_ours(arch, h5_path, embed_dim, x):
    import flax
    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.cli.import_keras_weights import (
        map_layers, read_keras_h5)
    from semantic_embeddings_tpu.models import build_network

    layers = read_keras_h5(h5_path)
    params, batch_stats, skipped = map_layers(layers, arch, backbone_key=None)
    assert skipped == [], f"{arch}: unmapped h5 layers {skipped}"
    spec = build_network(embed_dim, arch)
    variables = jax.eval_shape(
        lambda: spec.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + x.shape[1:]), train=False
        )
    )
    params = _merge_full(
        flax.core.unfreeze(variables["params"]), params, f"{arch} params")
    batch_stats = _merge_full(
        flax.core.unfreeze(variables["batch_stats"]), batch_stats,
        f"{arch} batch_stats")
    out = spec.module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)},
        jnp.asarray(x), train=False,
    )
    return np.asarray(out)


def _roundtrip(ref_utils, arch, embed_dim, tmp_path, input_hw=32, atol=2e-4):
    tf_keras.backend.clear_session()  # reset the auto-name counters
    km = ref_utils.build_network(embed_dim, arch)
    _randomize_weights(km, seed=hash(arch) % 2**31)
    h5 = str(tmp_path / f"{arch}.h5")
    km.save_weights(h5)

    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, (2, input_hw, input_hw, 3)).astype(np.float32)
    y_ref = km.predict(x, verbose=0)
    y_ours = _forward_ours(arch, h5, embed_dim, x)
    assert y_ours.shape == y_ref.shape
    scale = max(1e-3, float(np.abs(y_ref).max()))
    np.testing.assert_allclose(y_ours, y_ref, rtol=0, atol=atol * scale,
                               err_msg=arch)


@pytest.mark.parametrize("arch,embed_dim", [
    ("simple", 16),
    ("resnet-110-wfc", 100),
    ("wrn-28-10", 100),
    ("densenet-100-12", 100),
])
def test_importer_forward_parity_fast(ref_utils, arch, embed_dim, tmp_path):
    _roundtrip(ref_utils, arch, embed_dim, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("arch,embed_dim", [
    ("pyramidnet-110-270", 100),
    ("pyramidnet-272-200", 100),
    ("densenet-bc-190-40", 100),
])
def test_importer_forward_parity_slow(ref_utils, arch, embed_dim, tmp_path):
    _roundtrip(ref_utils, arch, embed_dim, tmp_path)


def test_importer_forward_parity_resnet101(ref_utils, tmp_path):
    """resnet-101 oracle through the reference's OWN builder path
    (keras_applications.resnet.ResNet101, shimmed to tf_keras's identical
    resnet_common implementation): save h5, import (bias folding into the
    1.001e-5-eps BNs), assert forward parity.  The builder is
    size-polymorphic (input_shape=None at utils.py:158), so the oracle
    runs at 64px — same weights/wiring as 224, 12x cheaper."""
    _roundtrip(ref_utils, "resnet-101", 100, tmp_path, input_hw=64,
               atol=3e-4)


@pytest.mark.slow
def test_importer_forward_parity_resnet152(ref_utils, tmp_path):
    _roundtrip(ref_utils, "resnet-152", 100, tmp_path, input_hw=64,
               atol=3e-4)


@pytest.mark.slow
def test_importer_forward_parity_nasnet_a(ref_utils, tmp_path):
    """nasnet-a oracle through the reference's exact builder path
    (keras.applications.NASNetLarge(include_top=False,
    input_shape=(224,224,3), pooling='avg') + Dense('embedding'),
    utils.py:266-272): randomize all ~770 weight layers, save h5, import
    by the name map (SeparableConv2D depthwise-kernel transposes,
    adjust-path disambiguation), and assert numerical forward parity —
    which validates the full cell wiring (skip_reduction skips, concat
    orders, VALID stem, factorized reduces) layer by layer.  Weight-count
    parity alone cannot catch a transposed wiring; this does."""
    _roundtrip(ref_utils, "nasnet-a", 100, tmp_path, input_hw=224,
               atol=1e-3)


def test_rn_family_import_not_covered(tmp_path):
    """rn18-rn200 h5 import refuses with a clear NOT-COVERED message
    (keras-resnet is not installable here, so its layer naming could not
    be oracle-verified; guessing would silently corrupt imports)."""
    from semantic_embeddings_tpu.cli.import_keras_weights import map_layers

    with pytest.raises(ValueError, match="NOT COVERED.*keras-resnet"):
        map_layers({"conv1": [np.zeros((7, 7, 3, 64), np.float32)]}, "rn50")


def test_resnet50_name_map_covers_model(ref_utils, tmp_path):
    """resnet-50 oracle: build the same v1 architecture with tf_keras's
    modern ResNet50, translate its modern layer names to the Keras-2.2
    names the reference's h5 files use (res{S}{L}_branch…), import, and
    assert (a) full coverage with the right shapes and (b) numerical
    forward parity.  One known constant differs: tf_keras's modern
    ResNet50 hardcodes BN eps 1.001e-5 while Keras 2.2's used the 1e-3
    default (which our model mirrors for imported reference h5s) — the
    comparison compensates exactly by shifting every imported moving
    variance by (1.001e-5 - 1e-3), which turns our 1e-3 BNs into the
    oracle's 1.001e-5 BNs with no other effect at inference."""
    tf_keras.backend.clear_session()
    km = ref_utils.build_network(100, "resnet-50")
    _randomize_weights(km, seed=50)

    import re

    renames = {"conv1_conv": "conv1", "conv1_bn": "bn_conv1",
               "predictions": "embedding", "embedding": "embedding"}
    translated = {}
    for layer in km.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        name = layer.name
        m = re.fullmatch(r"conv(\d)_block(\d+)_([123])_(conv|bn)", name)
        if m:
            stage, block, idx, kind = m.groups()
            letter = chr(ord("a") + int(block) - 1)
            branch = {"1": "2a", "2": "2b", "3": "2c"}[idx]
            prefix = "res" if kind == "conv" else "bn"
            name = f"{prefix}{stage}{letter}_branch{branch}"
        else:
            m = re.fullmatch(r"conv(\d)_block(\d+)_0_(conv|bn)", name)
            if m:
                stage, block, kind = m.groups()
                letter = chr(ord("a") + int(block) - 1)
                prefix = "res" if kind == "conv" else "bn"
                name = f"{prefix}{stage}{letter}_branch1"
            else:
                name = renames.get(name, name)
        translated[name] = [np.asarray(w) for w in ws]

    import jax
    import jax.numpy as jnp

    from semantic_embeddings_tpu.cli.import_keras_weights import map_layers
    from semantic_embeddings_tpu.models import build_network

    params, batch_stats, skipped = map_layers(
        translated, "resnet-50", backbone_key=None)
    assert skipped == [], skipped
    spec = build_network(100, "resnet-50")
    variables = jax.eval_shape(
        lambda: spec.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
        )
    )
    import flax

    _merge_full(flax.core.unfreeze(variables["params"]), params, "rn50 params")
    _merge_full(flax.core.unfreeze(variables["batch_stats"]), batch_stats,
                "rn50 batch_stats")

    # forward parity (eps-compensated, see docstring)
    def shift_var(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = shift_var(v)
            elif k == "var":
                out[k] = v + np.float32(1.001e-5 - 1e-3)
            else:
                out[k] = v
        return out

    rng2 = np.random.default_rng(1)
    x = rng2.normal(0.0, 1.0, (2, 224, 224, 3)).astype(np.float32)
    y_ref = km.predict(x, verbose=0)
    y_ours = spec.module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(
             jnp.asarray, shift_var(batch_stats))},
        jnp.asarray(x), train=False,
    )
    assert y_ours.shape == y_ref.shape
    scale = max(1e-3, float(np.abs(y_ref).max()))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=0,
                               atol=3e-4 * scale)
