"""Model zoo: shapes, parameter counts, taps, and regularization filters.

Parameter counts are checked with ``jax.eval_shape`` (no FLOPs), forward
passes with small block-count variants; full-size forwards live behind the
``slow`` marker so the default suite stays fast on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models import (
    ARCHITECTURES,
    DenseNet,
    EmbeddingModel,
    PyramidNet,
    SmallResNet,
    WideResNet,
    build_network,
    l2norm,
)


def _shape_init(module, input_shape=(1, 32, 32, 3)):
    return jax.eval_shape(
        lambda k: module.init(k, jnp.zeros(input_shape), train=False),
        jax.random.PRNGKey(0),
    )


def _param_count(variables):
    return sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )


def test_parameter_counts_match_published():
    """Published model sizes pin down the architecture wiring."""
    expectations = {
        # (arch, input, expected M params, tolerance)
        "resnet-110-fc": (32, 1.74e6, 0.1e6),   # He et al. 110-layer ~1.7M
        "resnet-110-wfc": (32, 6.9e6, 0.4e6),   # doubled widths ~4x params
        "resnet-32": (32, 0.46e6, 0.05e6),      # He et al. 32-layer ~0.46M
        "wrn-28-10": (32, 36.5e6, 0.5e6),       # Zagoruyko & Komodakis
        "densenet-100-12": (32, 7.0e6, 0.3e6),  # Huang et al. ~7.0M (no BC)
        "densenet-bc-190-40": (32, 25.6e6, 0.8e6),
        "pyramidnet-272-200": (32, 26.0e6, 1.5e6),  # Han et al. ~26.0M
        "pyramidnet-110-270": (32, 28.5e6, 1.5e6),  # Han et al. ~28.3M
        "resnet-50": (224, 25.6e6, 0.5e6),
        "resnet-101": (224, 44.6e6, 0.8e6),
        "rn18": (224, 11.7e6, 0.4e6),
        "rn34": (224, 21.8e6, 0.5e6),
        # The bottleneck tail of the keras-resnet family
        # (/root/reference/utils.py:245-264): our builds land on the
        # canonical published counts (25.557M / 44.549M / 60.193M; rn200 =
        # rn152 + 16 stage-2 bottleneck blocks ≈ 64.67M).  Wiring-level
        # oracle parity for rn* remains excluded-by-decision (PARITY.md
        # §2.3: keras-resnet is not installable here), so these counts are
        # the strongest executable pin on the family's block structure.
        "rn50": (224, 25.56e6, 0.3e6),
        "rn101": (224, 44.55e6, 0.5e6),
        "rn152": (224, 60.19e6, 0.7e6),
        "rn200": (224, 64.67e6, 0.7e6),
    }
    for arch, (size, expected, tol) in expectations.items():
        classes = 1000 if size == 224 else 100
        spec = build_network(classes, arch, classification=True)
        variables = _shape_init(spec.module, (1, size, size, 3))
        n = _param_count(variables)
        assert abs(n - expected) < tol, (arch, n, expected)


@pytest.mark.parametrize(
    "module,expected_dim",
    [
        (SmallResNet(n=2, filters=(8, 16, 32), classes=10, top_activation=None), 10),
        (PyramidNet(depth=20, alpha=24, bottleneck=True, classes=10,
                    top_activation=None), 10),
        (PyramidNet(depth=14, alpha=12, bottleneck=False, classes=10,
                    top_activation=None), 10),
        (WideResNet(classes=10, n_blocks=2, width=2, final_activation=None), 10),
        (DenseNet(classes=10, depth=10, growth_rate=4, bottleneck=True,
                  reduction=0.5, top_activation=None), 10),
    ],
)
def test_small_variant_forward(module, expected_dim):
    x = jnp.ones((2, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    out = module.apply(variables, x, train=False)
    assert out.shape == (2, expected_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_plainnet_forward_and_softmax():
    spec = build_network(10, "simple", classification=True)
    x = jnp.ones((3, 32, 32, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    out = spec.module.apply(variables, x, train=False)
    assert out.shape == (3, 10)
    np.testing.assert_allclose(np.asarray(out).sum(axis=1), 1.0, rtol=1e-5)


def test_resnet32_embedding_has_no_top():
    # Reference parity: include_top=classification for resnet-32/-110
    # (/root/reference/utils.py:162-172) -> embedding output is the pooled
    # 64-d feature map, not num_outputs.
    spec = build_network(100, "resnet-32")
    variables = _shape_init(spec.module)
    out = jax.eval_shape(
        lambda v: spec.module.apply(v, jnp.zeros((2, 32, 32, 3)), train=False),
        variables,
    )
    assert out.shape == (2, 64)


def test_train_mode_updates_batch_stats():
    module = SmallResNet(n=1, filters=(8, 8, 8), classes=10)
    x = jnp.ones((2, 32, 32, 3)) * 3.0
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    _, updates = module.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_embedding_model_l2norm_and_cls_head():
    spec = build_network(100, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm", cls_classes=100)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb, prob = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(prob).sum(axis=1), 1.0, rtol=1e-5)


def test_cls_head_sees_normalized_embedding():
    """Reference parity: the cls head attaches AFTER the l2norm layer; the
    fused-loss training model (raw output + cls_input='l2norm') must produce
    identical probabilities with shared params."""
    spec = build_network(16, "simple")
    m_norm = EmbeddingModel(backbone=spec.module, output="l2norm",
                            cls_classes=5)
    m_fused = EmbeddingModel(backbone=spec.module, output="linear",
                             cls_classes=5, cls_input="l2norm")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 32, 32, 3)).astype(np.float32)
    )
    variables = m_norm.init(jax.random.PRNGKey(0), x, train=False)
    emb_n, prob_n = m_norm.apply(variables, x, train=False)
    emb_f, prob_f = m_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(prob_n), np.asarray(prob_f),
                               rtol=1e-6)
    # raw vs normalized outputs differ, but normalize(raw) == normalized
    np.testing.assert_allclose(
        np.asarray(l2norm(emb_f)), np.asarray(emb_n), rtol=1e-5
    )


def test_feature_taps():
    spec = build_network(100, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, state = model.apply(variables, x, train=False, mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    tapped = {
        "/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat
    }
    assert any("avg_pool" in t for t in tapped)
    assert any("embedding" in t for t in tapped)
    assert any("l2norm" in t for t in tapped)


def test_l2_penalty_filters():
    spec = build_network(100, "simple")
    variables = spec.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    penalty = spec.l2_penalty(variables["params"])
    assert float(penalty) > 0
    # Final 'top' layer excluded for plainnet: zero out everything else -> 0.
    import flax

    params = flax.core.unfreeze(variables["params"])
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    zeroed["top"] = params["top"]
    assert float(spec.l2_penalty(zeroed)) == 0.0

    # wrn has no regularization at all.
    assert build_network(100, "wrn-28-10").l2_filters == []


def test_l2norm_matches_tf_semantics():
    x = np.array([[3.0, 4.0], [0.0, 0.0]])
    out = np.asarray(l2norm(jnp.asarray(x)))
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
    assert np.all(np.isfinite(out[1]))  # zero vector stays finite


def test_selu_suffix():
    spec = build_network(100, "resnet-32-selu")
    assert spec.module.activation == "selu"


def test_nasnet_a():
    from semantic_embeddings_tpu.models.nasnet import NASNetA

    spec = build_network(1000, "nasnet-a", classification=True)
    variables = _shape_init(spec.module, (1, 224, 224, 3))
    # EXACT parity with keras NASNetLarge: keras's count_params folds the
    # BN moving statistics in as non-trainable weights, which flax keeps in
    # batch_stats — count both.  84,916,818 without top (verified against
    # tf_keras.applications.NASNetLarge(include_top=False)), + the
    # 4032x1000(+bias) classifier = the published 88,949,818.
    import jax

    n = _param_count(variables) + sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(variables["batch_stats"])
    )
    assert n == 88_949_818, n
    tiny = NASNetA(classes=5, num_normal_cells=1, penultimate_filters=24 * 4,
                   stem_filters=8, top_activation=None)
    import jax

    v = tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                  train=False)
    out = tiny.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_architecture_list_matches_reference():
    assert ARCHITECTURES[:5] == [
        "simple",
        "resnet-32",
        "resnet-110",
        "resnet-110-fc",
        "resnet-110-wfc",
    ]
    assert "nasnet-a" in ARCHITECTURES


@pytest.mark.slow
@pytest.mark.parametrize(
    "arch", ["resnet-110-wfc", "wrn-28-10", "densenet-100-12", "pyramidnet-110-270"]
)
def test_full_size_forward(arch):
    spec = build_network(100, arch)
    x = jnp.ones((2, 32, 32, 3))
    variables = jax.jit(
        lambda k: spec.module.init(k, x, train=False)
    )(jax.random.PRNGKey(0))
    out = jax.jit(lambda v, x: spec.module.apply(v, x, train=False))(variables, x)
    expected = 64 if arch == "resnet-110" else 100
    assert out.shape == (2, expected)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cls_base_taps_named_module():
    """--cls_base parity (learn_image_embeddings.py:34-40): the head attaches
    to a named backbone module's output instead of the embedding."""
    from semantic_embeddings_tpu.models.layers import KerasBatchNorm, dense

    spec = build_network(16, "simple")
    model = EmbeddingModel(backbone=spec.module, output="l2norm",
                           cls_classes=5, cls_base="top")
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb, prob = model.apply(variables, x, train=False)
    assert prob.shape == (2, 5)

    # The head must see the RAW 'top' output (pre-l2norm), not the
    # transformed embedding: recompute it manually with shared params.
    raw = spec.module.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        x, train=False,
    )
    head = jax.nn.relu(raw)
    head = KerasBatchNorm(name="cls_bn").apply(
        {"params": variables["params"]["cls_bn"],
         "batch_stats": variables["batch_stats"]["cls_bn"]},
        head, False,
    )
    head = dense(5, name="cls_top").apply(
        {"params": {"kernel": variables["params"]["cls_top"]["kernel"],
                    "bias": variables["params"]["cls_top"]["bias"]}}, head
    )
    np.testing.assert_allclose(
        np.asarray(prob), np.asarray(jax.nn.softmax(head)), rtol=1e-5
    )
    # And it differs from the default head placement (post-l2norm).
    m_def = EmbeddingModel(backbone=spec.module, output="l2norm", cls_classes=5)
    _, prob_def = m_def.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(prob), np.asarray(prob_def))

    # Gradients flow through the tap into the backbone.
    def loss(params):
        _, p = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        return -jnp.log(p[:, 0]).mean()

    g = jax.grad(loss)(variables["params"])
    gn = np.linalg.norm(np.asarray(g["backbone"]["conv1"]["kernel"]))
    assert gn > 0


def test_cls_base_errors():
    spec = build_network(8, "resnet-32")
    x = jnp.ones((1, 32, 32, 3))
    ambiguous = EmbeddingModel(backbone=spec.module, output="l2norm",
                               cls_classes=3, cls_base="conv_a")
    with pytest.raises(ValueError, match="ambiguous"):
        ambiguous.init(jax.random.PRNGKey(0), x, train=False)
    missing = EmbeddingModel(backbone=spec.module, output="l2norm",
                             cls_classes=3, cls_base="nope")
    with pytest.raises(ValueError, match="matched no module"):
        missing.init(jax.random.PRNGKey(0), x, train=False)


def test_space_to_depth_stem_equals_7x7_conv():
    """SpaceToDepthStem must compute the exact 7x7/2 SAME conv (same
    kernel parameter), including the gradient."""
    import jax

    from semantic_embeddings_tpu.models.resnet import SpaceToDepthStem

    rng = np.random.default_rng(0)
    for hw in (64, 224):
        x = jnp.asarray(rng.normal(0, 1, (2, hw, hw, 3)).astype(np.float32))
        stem = SpaceToDepthStem(16)
        v = stem.init(jax.random.PRNGKey(0), x)
        y = stem.apply(v, x)
        # the plain stem is ZeroPadding2D((3,3)) + VALID 7x7/2
        # (keras_applications 1.0.8 alignment; see ResNet.__call__)
        ref = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))),
            v["params"]["kernel"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=2e-5)
    g1 = jax.grad(lambda k: _sq_sum(stem.apply({"params": {"kernel": k}}, x)))(
        v["params"]["kernel"])
    g2 = jax.grad(lambda k: _sq_sum(jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))), k, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))))(v["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-3)


def _sq_sum(y):
    return (y * y).sum()


def test_conv1x1_as_dot_equals_conv():
    import jax

    from semantic_embeddings_tpu.models.resnet import Conv1x1AsDot

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 12)).astype(np.float32))
    for stride in (1, 2):
        mod = Conv1x1AsDot(24, stride)
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_resnet_stem_variants_share_checkpoint_tree():
    """stem_s2d / conv1x1_as_dot must not change the parameter tree
    (checkpoints, importer, finetuning all interchange)."""
    import dataclasses

    import jax

    from semantic_embeddings_tpu.models.resnet import ResNet

    base = ResNet(depth=50, classes=10, include_top=True)
    x = jnp.zeros((1, 64, 64, 3))
    trees = []
    for s2d in (False, True):
        for dot in (False, True):
            m = dataclasses.replace(base, stem_s2d=s2d, conv1x1_as_dot=dot)
            shapes = jax.eval_shape(
                lambda m=m: m.init(jax.random.PRNGKey(0), x, train=False))
            trees.append(jax.tree_util.tree_structure(shapes))
            if len(trees) > 1:
                assert trees[-1] == trees[0]
