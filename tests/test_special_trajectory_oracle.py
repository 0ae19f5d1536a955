"""Special-learner training trajectories vs the reference's own runtime.

``test_train_trajectory_oracle`` proves executed-runtime equivalence for the
flagship embedding learner (SGD + inv_correlation).  This module extends the
same oracle to the three special learners, whose training semantics are
otherwise only argued formula-by-formula:

- **DeViSE** (``/root/reference/learn_devise.py:105-118``): Adagrad (zero
  accumulator init, inverse-time decay, NO clipnorm) + the max-margin
  ranking loss ``utils.devise_ranking_loss`` over the backbone's raw
  (un-normalized) embedding output.
- **Label embedding** (``learn_labelembedding.py:17-56,162-171``): the
  composite Sun et al. loss (two classifier heads, stop-gradient branch,
  batch-coupled L_emb_o2 mask term, learnable identity-initialized label
  embeddings) driven through Keras's multi-output compile where only the
  ``labelembed_loss`` output carries loss.
- **Center loss** (``learn_center_loss.py:17-41,160-165``): softmax CE +
  weighted half-squared-distance to learnable OR frozen class centroids
  (frozen == Keras ``trainable=False`` on the Embedding layer).

The reference's OWN learner modules are imported under the tf_keras shims
(``test_keras_import_oracle._install_keras2_shims``) so ``labelembed_model``
/ ``center_loss_model`` / ``devise_ranking_loss`` are executed literally,
compiled with the legacy (Keras-2-formula) optimizers, and free-run
``train_on_batch`` for 12 steps; our jitted steps must reproduce the
per-step losses and the final parameter + BN-stat trees from the same
imported init.  Float64 on both sides for the same chaos-suppression
reasons documented in test_train_trajectory_oracle (measured residuals
there: ~4e-8 over 12 steps).

The reference implementation is imported as an oracle only (sanctioned in
CLAUDE.md); nothing from it ships at runtime.
"""

import importlib
import sys
import zlib

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")

from test_keras_import_oracle import (  # noqa: E402
    REFERENCE_DIR,
    _flatten,
    _merge_full,
    _randomize_weights,
    ref_utils,  # noqa: F401  (fixture re-export)
)
from test_train_trajectory_oracle import (  # noqa: E402
    LR_Q,
    MOMENTUM_Q,
    _assert_tree_close,
    _make_batches,
    float64_keras,  # noqa: F401  (fixture re-export)
)

LR = 0.05
DECAY = 0.3
CLIPNORM = 10.0
STEPS = 12
LOSS_RTOL = 1e-6
WEIGHT_RTOL = 1e-6


@pytest.fixture(scope="module")
def ref_learners(ref_utils):  # noqa: F811
    """The reference's learner modules (they import ``datasets``, which the
    shims make importable; only the module-level functions are used)."""
    del ref_utils
    # Force the reference checkout to the FRONT even if something put the
    # repo root ahead of it mid-session (the repo root hosts same-named
    # entry-point shims for every learner), and evict any cached bare-name
    # module that is not the reference's.
    if REFERENCE_DIR in sys.path:
        sys.path.remove(REFERENCE_DIR)
    sys.path.insert(0, REFERENCE_DIR)
    names = ("learn_devise", "learn_labelembedding",
             "learn_center_loss", "learn_classifier")
    for name in names:
        mod = sys.modules.get(name)
        if mod is not None and not getattr(mod, "__file__", "").startswith(
                REFERENCE_DIR):
            del sys.modules[name]
    out = {name: importlib.import_module(name) for name in names}
    for name, mod in out.items():
        assert mod.__file__.startswith(REFERENCE_DIR), (
            f"{name} resolved to {mod.__file__}, not the reference checkout")
    return out


@pytest.fixture
def floatx_one_hot():
    """f64-mode compat: tf_keras's ``K.one_hot`` ignores floatx (tf.one_hot
    defaults to f32), which breaks the reference labelembed loss graph ONLY
    under this module's float64 chaos-suppression mode; honor floatx like
    the Keras 2.2 the reference ran on.  Identical semantics at f32.  The
    Lambda loss re-executes per forward, so the patch spans the test."""
    import tensorflow as tf

    K = tf_keras.backend
    orig = K.one_hot
    K.one_hot = lambda indices, num_classes: tf.one_hot(
        indices, num_classes, dtype=K.floatx())
    try:
        yield
    finally:
        K.one_hot = orig


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _set_leaf(flat, module, leaf, value):
    """Places ``value`` at the unique flattened key ``.../module/leaf`` (or
    the bare key ``module`` for direct array params like the label
    embeddings)."""
    if module == leaf:
        keys = [k for k in flat if k == module]
    else:
        keys = [k for k in flat
                if f"/{module}/" in f"/{k}" and k.endswith("/" + leaf)]
    assert len(keys) == 1, (module, leaf, keys)
    assert tuple(flat[keys[0]].shape) == tuple(np.shape(value)), (
        module, leaf, flat[keys[0]].shape, np.shape(value))
    flat[keys[0]] = np.asarray(value, np.float64)


def _snapshot_heads(km, head_map):
    """Head-layer weights captured BEFORE the Keras model trains.  The
    backbone init travels through the saved h5, but the learner heads are
    copied straight from the live layers — reading them after the reference
    free-ran its 12 steps would graft trained heads onto the init backbone
    (exactly the bug this helper exists to prevent)."""
    return {kname: [np.array(w) for w in km.get_layer(kname).get_weights()]
            for kname in head_map}


def _head_weights(km_or_ws, params_flat, stats_flat, head_map):
    """Copies Keras head-layer weights into the flattened trees.

    ``km_or_ws``: the live Keras model (final-state checks) or a
    :func:`_snapshot_heads` dict (init-state setup).
    head_map: keras layer name -> ('bn', our_module) | ('dense', our_module)
    | ('embedding', our_param_name)."""
    for kname, (kind, ours) in head_map.items():
        ws = (km_or_ws[kname] if isinstance(km_or_ws, dict)
              else km_or_ws.get_layer(kname).get_weights())
        if kind == "bn":
            gamma, beta, mean, var = ws
            _set_leaf(params_flat, ours, "scale", gamma)
            _set_leaf(params_flat, ours, "bias", beta)
            _set_leaf(stats_flat, ours, "mean", mean)
            _set_leaf(stats_flat, ours, "var", var)
        elif kind == "dense":
            kernel, bias = ws
            _set_leaf(params_flat, ours, "kernel", kernel)
            _set_leaf(params_flat, ours, "bias", bias)
        elif kind == "embedding":
            (table,) = ws
            _set_leaf(params_flat, ours, ours, table)
        else:  # pragma: no cover
            raise AssertionError(kind)


def _import_backbone(h5_path, arch, params_tpl, stats_tpl, head_names,
                     what, backbone_key="backbone"):
    """Backbone weights via the production importer.  The learner-specific
    head layers are removed first (they are mapped separately, straight
    from the live Keras model) — a labelembed/center head named ``prob``
    would otherwise collide with the importer's ``prob -> top`` rule for
    the softmax-output architectures."""
    import flax

    from semantic_embeddings_tpu.cli.import_keras_weights import (
        map_layers, read_keras_h5)

    layers = read_keras_h5(h5_path)
    for name in head_names:
        layers.pop(name, None)
    params, batch_stats, skipped = map_layers(
        layers, arch, has_cls_head=False, backbone_key=backbone_key,
    )
    assert skipped == [], f"{what}: unmapped h5 layers {skipped}"
    params_flat = _flatten(flax.core.unfreeze(params_tpl))
    stats_flat = _flatten(flax.core.unfreeze(stats_tpl))
    for k, v in _flatten(params).items():
        assert k in params_flat and tuple(params_flat[k].shape) == v.shape, k
        params_flat[k] = v
    for k, v in _flatten(batch_stats).items():
        assert k in stats_flat and tuple(stats_flat[k].shape) == v.shape, k
        stats_flat[k] = v
    return params_flat, stats_flat


def _keras_losses(km, out):
    return dict(zip(km.metrics_names, [float(v) for v in np.atleast_1d(out)]))


def _run_ours(state, step, xs, ys, lrs):
    import jax

    our_losses = []
    rng = jax.random.PRNGKey(0)
    for t in range(STEPS):
        state, metrics = step(
            state, {"x": xs[t], "y": ys[t]}, np.float64(lrs[t]), rng
        )
        our_losses.append(jax.device_get(metrics))
    return jax.device_get(state), our_losses


def _assert_losses(arch, ref_losses, our_losses, pairs, rtol=LOSS_RTOL,
                   strict_rtol=LOSS_RTOL, fork_tail_rtol=None):
    """pairs: (keras metrics_names key, our metrics key).

    The first 3 steps are always gated at ``strict_rtol`` (default the
    strict 1e-6) — a SEMANTIC mismatch (wrong optimizer formula, decay
    convention, loss term) shows up immediately at 1e-3+, before chaotic
    amplification has room to grow.  ``rtol`` relaxes only the tail for
    losses with discrete gradient boundaries (hinge kinks, argmax masks,
    ReLU pre-activations near zero) whose boundary flips amplify f64 noise
    faster than the smooth-loss learners (measured: devise agrees to
    ~3e-8 on steps 0-2, drifts to ~3e-6 by step 6).

    The flip pattern is HOST-dependent: the same two binaries are
    bit-deterministic run-to-run on one machine, but XLA:CPU / TF codegen
    differences between CPU generations resolve a boundary within ~1e-8
    of zero differently (verified: the r3 host ran labelembed strictly at
    1e-6 for 12 steps; the current host flips an argmax at step 5 and
    lands at 3.6e-4 by step 10, bit-identically across runs and across
    the r3/r4 code).  Gates below are set >=5x above the worst measured
    drift while staying >=5x under the semantic-bug scale.

    ``fork_tail_rtol`` (r5) makes the tail gate STRUCTURAL instead of a
    bet on the host's flip realization (which broke between the r3/r4/r5
    hosts): the trajectory must track at ``rtol`` until its first
    boundary-flip fork (the first step whose error exceeds ``rtol``),
    and every step from the fork on must stay within ``fork_tail_rtol``
    — order-of-magnitude agreement that bounds chaotic amplification
    without predicting where the fork lands.  A real semantic bug fails
    regardless: it blows the strict first-3-step window at step 0, long
    before any fork."""
    worst = 0.0
    per_step_err = [0.0] * STEPS
    rows = []
    for t in range(STEPS):
        gate = strict_rtol if t < 3 else rtol
        for ref_key, our_key in pairs:
            ref_val = ref_losses[t][ref_key]
            ours = float(our_losses[t][our_key])
            err = abs(ours - ref_val) / max(abs(ref_val), 1e-2)
            worst = max(worst, err)
            per_step_err[t] = max(per_step_err[t], err)
            rows.append((t, ref_key, ref_val, ours, err, gate))
    fork_step = None
    if fork_tail_rtol is not None:
        fork_step = next((t for t in range(3, STEPS)
                          if per_step_err[t] > rtol), None)

    def effective_gate(t, gate):
        if fork_step is not None and t >= fork_step:
            return fork_tail_rtol
        return gate

    # full table first so a tail failure still shows the whole trajectory
    print(f"{arch} per-step loss errors:")
    for t, key, ref_val, ours, err, gate in rows:
        print(f"  step {t:2d} {key}: ref {ref_val!r} ours {ours!r} "
              f"rel-err {err:.2e} (gate {effective_gate(t, gate):g})")
    if fork_step is not None:
        print(f"{arch}: boundary-flip fork at step {fork_step}; tail gated "
              f"at {fork_tail_rtol:g}")
    for t, key, ref_val, ours, err, gate in rows:
        assert err <= effective_gate(t, gate), (
            f"{arch} step {t} {key}: ours {ours!r} vs reference "
            f"{ref_val!r} (rel err {err:.2e})"
        )
    return worst


def _final_state_check(km, arch, state, state_tpl, h5_final_importer_args,
                       head_map, what, rtol=WEIGHT_RTOL,
                       backbone_key="backbone", rtol_overrides=None):
    """Final params + batch stats: backbone via the importer on a fresh
    save_weights file, heads straight from the live Keras layers.

    ``rtol_overrides``: {top-level param name: rtol} for tensors updated
    through a DISCRETE mask (labelembed's argmax "confusing class"
    column, center loss's label-gathered centroids).  At an exact tie
    the LOSS is continuous but the gradient mask is not, so a boundary
    flip moves one head tensor by O(lr) while every loss stays at 1e-8
    — measured at lr/100 on the r5 host: losses ≤4.7e-7 all 12 steps,
    `labelembeddings` off by 7.0e-5, `cls_centroids` by 1.7e-4, backbone
    and every other tensor strict.  The override bound stays ~10x under
    the O(lr·steps) scale a real formula bug on those tensors produces."""
    import flax

    h5_final, expected_skipped = h5_final_importer_args
    km.save_weights(h5_final)
    ref_p, ref_bs = _import_backbone(
        h5_final, arch, state_tpl.params, state_tpl.batch_stats,
        expected_skipped, f"{what} final", backbone_key=backbone_key)
    _head_weights(km, ref_p, ref_bs, head_map)
    ours_p = flax.core.unfreeze(state.params)
    ref_p_tree = _unflatten(ref_p)
    for name, r in (rtol_overrides or {}).items():
        w = _assert_tree_close({name: ours_p.pop(name)},
                               {name: ref_p_tree.pop(name)},
                               f"{what} final {name} (mask-flip bound)",
                               rtol=r)
        print(f"{what}: {name} rel-err {w[0]:.2e} (mask-flip bound {r:g})")
    worst_w = _assert_tree_close(
        ours_p, ref_p_tree, f"{what} final params", rtol=rtol)
    worst_bs = _assert_tree_close(
        flax.core.unfreeze(state.batch_stats), _unflatten(ref_bs),
        f"{what} final batch_stats", rtol=rtol)
    print(f"{what}: {STEPS} steps; worst param rel-err {worst_w[0]:.2e} at "
          f"{worst_w[1]}; worst batch-stat rel-err {worst_bs[0]:.2e} at "
          f"{worst_bs[1]}")


# ---------------------------------------------------------------------------
# DeViSE: Adagrad + ranking loss
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize(
    "lr,tail_rtol,weight_rtol",
    [
        # Recipe-scale lr: Adagrad's zero-init accumulator makes the first
        # steps move every weight by ~lr, so hinge-boundary flips are
        # frequent and each flip injects an O(lr) gradient difference —
        # measured profile: <=1e-7 through step 5, then discrete jumps
        # 2.6e-6 -> 2e-4 -> plateau ~4e-3 by step 11. The strict steps 0-2
        # carry the semantic check; the tail gate only bounds the chaos.
        # (Weight bound 1e-1: the flip pattern is host-dependent — the r3
        # host measured ~2e-2 final-weight drift, the current one 6.1e-2
        # from the same code; see _assert_losses docstring.)
        pytest.param(0.05, 2e-2, 1e-1, id="lr0.05-recipe"),
        # 10x smaller lr suppresses the boundary flips; the whole 12-step
        # trajectory and the final weights gate strictly, proving the
        # Adagrad accumulator/decay/loss semantics over every step.
        pytest.param(0.005, 1e-6, 1e-6, id="lr0.005-strict"),
    ],
)
def test_trajectory_devise(ref_utils, ref_learners, float64_keras,  # noqa: F811
                           tmp_path, lr, tail_rtol, weight_rtol):
    """12 reference ``train_on_batch`` steps under legacy Adagrad
    (inverse-time decay, zero accumulator init, no clipnorm) with the
    reference's own ``devise_ranking_loss`` are reproduced by our jitted
    adagrad step (``learn_devise.py:105-118``, ``utils.py:103-122``)."""
    import jax

    arch, embed_dim, n_classes, batch, margin = "simple", 16, 10, 20, 0.1
    lr_q = float(np.float32(lr))  # f32 hyper-variable, like LR_Q
    km = ref_utils.build_network(embed_dim, arch)
    _randomize_weights(km, seed=zlib.crc32(b"traj-devise"))
    h5_init = str(tmp_path / "init.h5")
    km.save_weights(h5_init)

    rng = np.random.default_rng(11)
    embedding = rng.normal(0.0, 1.0, (n_classes, embed_dim))
    embedding /= np.linalg.norm(embedding, axis=1, keepdims=True)
    embedding = embedding.astype(np.float32).astype(np.float64)

    km.compile(
        optimizer=tf_keras.optimizers.legacy.Adagrad(
            learning_rate=lr, initial_accumulator_value=0.0, decay=DECAY),
        loss=ref_utils.devise_ranking_loss(embedding, margin),
    )
    xs, ys = _make_batches(STEPS, batch, 32, n_classes, seed=5)
    ref_losses = [
        {"loss": float(km.train_on_batch(xs[t], embedding[ys[t]]))}
        for t in range(STEPS)
    ]

    with jax.enable_x64(True):
        from semantic_embeddings_tpu.cli import common
        from semantic_embeddings_tpu.train import make_train_step
        from semantic_embeddings_tpu.train.losses import devise_ranking_loss
        from semantic_embeddings_tpu.train.optimizer import effective_lr

        model, spec = common.build_embedding_model(
            embed_dim, arch, "mse", 0)  # linear output = raw Dense embedding
        state0 = common.init_model_state(model, spec.input_size, 3)
        p_flat, bs_flat = _import_backbone(
            h5_init, arch, state0.params, state0.batch_stats, [],
            "devise init")
        state = state0.replace(
            params=_unflatten(p_flat), batch_stats=_unflatten(bs_flat))
        step = make_train_step(
            model, lambda raw, rng, train: (raw["x"], raw["y"]),
            class_embedding=embedding,
            loss_fn_override=devise_ranking_loss(embedding, margin),
            optimizer="adagrad",
            l2_penalty_fn=lambda p: spec.l2_penalty(p["backbone"]),
        )
        lrs = [effective_lr(lr_q, DECAY, t) for t in range(STEPS)]
        state, our_losses = _run_ours(state, step, xs, ys, lrs)

    # hinge-kink chaos (see the parametrize note): strict early gate,
    # lr-dependent tail
    worst = _assert_losses(arch, ref_losses, our_losses, [("loss", "loss")],
                           rtol=tail_rtol)
    _final_state_check(
        km, arch, state, state0, (str(tmp_path / "final.h5"), []),
        {}, f"devise/{arch}@lr{lr} (worst loss rel-err {worst:.2e})",
        rtol=weight_rtol)


# ---------------------------------------------------------------------------
# Label-embedding network
# ---------------------------------------------------------------------------

_LE_HEADS = {
    "embedding_bn": ("bn", "embedding_bn"),
    "prob": ("dense", "prob_head"),
    "out2": ("dense", "out2"),
    "labelembeddings": ("embedding", "labelembeddings"),
}


@pytest.mark.slow
@pytest.mark.parametrize(
    "lr,tail_rtol,weight_rtol",
    [
        # Recipe-scale lr: the argmax "most-confusing class" mask flips on
        # host-dependent ReLU boundaries, so the tail is fork-tolerant
        # (strict first 3 steps; rtol until the first fork; 5e-2 after —
        # see _assert_losses).  Weight gate = the fork envelope.
        pytest.param(LR, 2e-3, 5e-2, id="lr0.05-recipe"),
        # 100x smaller lr suppresses the boundary flips (lr/10 still
        # picked up a marginal step-5 flip at 1.4e-6 on the r5 host): the
        # full 12-step trajectory and the final weights gate strictly, so
        # the learner family keeps a full-trajectory strict gate on one
        # configuration (ADVICE r4).
        pytest.param(LR / 100, 1e-6, 1e-6, id="lr0.0005-strict"),
    ],
)
def test_trajectory_labelembed(ref_utils, ref_learners, float64_keras,  # noqa: F811
                               floatx_one_hot, tmp_path, lr, tail_rtol,
                               weight_rtol):
    """The reference's own ``labelembed_model`` + composite loss compiled
    with legacy SGD (momentum+decay+clipnorm), free-running train_on_batch;
    our ``make_labelembed_train_step`` must reproduce the loss trajectory
    and the final weights incl. the learnable label-embedding table
    (``learn_labelembedding.py:17-56,162-171``)."""
    import jax

    le = ref_learners["learn_labelembedding"]
    arch, embed_dim, n_classes, batch = "simple", 16, 10, 20
    tau, alpha, beta = 2.0, 0.9, 0.5
    lr_q = float(np.float32(lr))  # f32 hyper-variable, like LR_Q

    base = ref_utils.build_network(embed_dim, arch)
    km = le.labelembed_model(base, n_classes, tau=tau, alpha=alpha, beta=beta)
    _randomize_weights(km, seed=zlib.crc32(b"traj-labelembed"))
    # identity-init table like the reference's fresh model (randomize_
    # weights scrambled it; identity keeps soft_tar informative early on)
    km.get_layer("labelembeddings").set_weights([np.eye(n_classes)])
    h5_init = str(tmp_path / "init.h5")
    km.save_weights(h5_init)
    init_heads = _snapshot_heads(km, _LE_HEADS)

    K = tf_keras.backend
    km.compile(
        optimizer=tf_keras.optimizers.legacy.SGD(
            learning_rate=lr, momentum=0.9, nesterov=False, decay=DECAY,
            clipnorm=CLIPNORM),
        loss={
            "labelembed_loss": lambda y_true, y_pred: y_pred[:, 0],
            "embedding": None,
            "prob": lambda y_true, y_pred: K.tf.zeros(
                K.shape(y_true)[:1], dtype=K.floatx()),
        },
        metrics={"prob": "accuracy"},
    )
    xs, ys = _make_batches(STEPS, batch, 32, n_classes, seed=13)
    onehots = np.eye(n_classes)[ys]
    ref_losses = []
    for t in range(STEPS):
        out = km.train_on_batch(
            [xs[t], ys[t].astype(np.float64)[:, None]],
            {"labelembed_loss": np.zeros((batch, 1)), "prob": onehots[t]},
        )
        ref_losses.append(_keras_losses(km, out))

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from semantic_embeddings_tpu.models import build_network
        from semantic_embeddings_tpu.models.learners import LabelEmbedModel
        from semantic_embeddings_tpu.train.optimizer import effective_lr
        from semantic_embeddings_tpu.train.special import (
            make_labelembed_train_step)
        from semantic_embeddings_tpu.train.state import new_train_state

        spec = build_network(embed_dim, arch)
        model = LabelEmbedModel(backbone=spec.module, num_classes=n_classes)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, spec.input_size, spec.input_size, 3)),
            jnp.zeros((1,), jnp.int32), train=False)
        state0 = new_train_state(variables)
        p_flat, bs_flat = _import_backbone(
            h5_init, arch, state0.params, state0.batch_stats,
            list(_LE_HEADS), "labelembed init")
        _head_weights(init_heads, p_flat, bs_flat, _LE_HEADS)
        state = state0.replace(
            params=_unflatten(p_flat), batch_stats=_unflatten(bs_flat))
        step = make_labelembed_train_step(
            model, lambda raw, rng, train: (raw["x"], raw["y"]),
            tau=tau, alpha=alpha, beta=beta,
            momentum=MOMENTUM_Q, clipnorm=CLIPNORM,
            l2_penalty_fn=lambda p: spec.l2_penalty(p["backbone"]),
        )
        lrs = [effective_lr(lr_q, DECAY, t) for t in range(STEPS)]
        state, our_losses = _run_ours(state, step, xs, ys, lrs)

    # The labelembed composite loss carries an argmax mask (the Sun et al.
    # "most-confusing class" term): at recipe lr a confusing-class flip
    # lands mid-trajectory at a host-dependent step (r3: never; r4: step
    # 5; see _assert_losses docstring) — fork-tolerant tail.  The lr/100
    # variant gates the whole trajectory strictly.
    worst = _assert_losses(arch, ref_losses, our_losses, [("loss", "loss")],
                           rtol=tail_rtol,
                           fork_tail_rtol=None if lr < LR else 5e-2)
    _final_state_check(
        km, arch, state, state0,
        (str(tmp_path / "final.h5"), list(_LE_HEADS)), _LE_HEADS,
        f"labelembed/{arch}@lr{lr} (worst loss rel-err {worst:.2e})",
        rtol=weight_rtol,
        # strict variant: everything at 1e-6 except the argmax-masked
        # label-embedding table (see _final_state_check docstring)
        rtol_overrides={"labelembeddings": 5e-4} if lr < LR else None)


# ---------------------------------------------------------------------------
# Center loss (learnable and frozen centroids)
# ---------------------------------------------------------------------------

_CL_HEADS = {
    "embedding_bn": ("bn", "embedding_bn"),
    "prob": ("dense", "prob_head"),
    "cls_centroids": ("embedding", "cls_centroids"),
}


@pytest.mark.slow
@pytest.mark.parametrize(
    "frozen,lr,strict",
    [
        pytest.param(False, LR, False, id="learnable"),
        pytest.param(True, LR, True, id="frozen"),
        # Learnable centroids at lr/100: the centroid-chasing boundary
        # flips are suppressed (lr/10 measured a step-2 flip at 1.4e-6
        # growing to e-3 by step 6 on the r5 host), so the learnable mode
        # too retains a full-trajectory strict gate on one configuration
        # (ADVICE r4; mirrors the devise strict variant).
        pytest.param(False, LR / 100, True, id="learnable-lr0.0005-strict"),
    ],
)
def test_trajectory_center_loss(ref_utils, ref_learners, float64_keras,  # noqa: F811
                                tmp_path, frozen, lr, strict):
    """The reference's own ``center_loss_model`` (softmax CE + weighted
    half-squared centroid distance) under legacy SGD; ``frozen`` covers the
    semantic-centroid mode where the Keras Embedding is ``trainable=False``
    and our step masks its gradient (``learn_center_loss.py:17-41,
    160-165``)."""
    import jax

    lr_q = float(np.float32(lr))  # f32 hyper-variable, like LR_Q

    cl = ref_learners["learn_center_loss"]
    arch, embed_dim, n_classes, batch = "simple", 16, 10, 20
    center_weight = 0.1

    rng = np.random.default_rng(17)
    fixed = (rng.normal(0.0, 1.0, (n_classes, embed_dim))
             .astype(np.float32).astype(np.float64) if frozen else None)

    base = ref_utils.build_network(embed_dim, arch)
    km = cl.center_loss_model(base, fixed if frozen else n_classes)
    _randomize_weights(km, seed=zlib.crc32(b"traj-center"))
    if frozen:
        # _randomize_weights scrambled the frozen table; restore it the way
        # the reference sets it (set_weights after build)
        km.get_layer("cls_centroids").set_weights([fixed])
    h5_init = str(tmp_path / "init.h5")
    km.save_weights(h5_init)
    init_heads = _snapshot_heads(km, _CL_HEADS)

    km.compile(
        optimizer=tf_keras.optimizers.legacy.SGD(
            learning_rate=lr, momentum=0.9, nesterov=False, decay=DECAY,
            clipnorm=CLIPNORM),
        loss={"prob": "categorical_crossentropy",
              "center_loss": lambda y_true, y_pred: y_pred},
        loss_weights={"prob": 1.0, "center_loss": center_weight},
        metrics={"prob": "accuracy"},
    )
    xs, ys = _make_batches(STEPS, batch, 32, n_classes, seed=19)
    onehots = np.eye(n_classes)[ys]
    ref_losses = []
    for t in range(STEPS):
        out = km.train_on_batch(
            [xs[t], ys[t].astype(np.float64)[:, None]],
            [onehots[t], np.zeros(batch)],
        )
        ref_losses.append(_keras_losses(km, out))

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from semantic_embeddings_tpu.models import build_network
        from semantic_embeddings_tpu.models.learners import CenterLossModel
        from semantic_embeddings_tpu.train.optimizer import effective_lr
        from semantic_embeddings_tpu.train.special import (
            make_center_loss_train_step)
        from semantic_embeddings_tpu.train.state import new_train_state

        spec = build_network(embed_dim, arch)
        model = CenterLossModel(
            backbone=spec.module, num_classes=n_classes,
            embed_dim=embed_dim, fixed_centroids=fixed)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, spec.input_size, spec.input_size, 3)),
            jnp.zeros((1,), jnp.int32), train=False)
        state0 = new_train_state(variables)
        p_flat, bs_flat = _import_backbone(
            h5_init, arch, state0.params, state0.batch_stats,
            list(_CL_HEADS), "center init")
        _head_weights(init_heads, p_flat, bs_flat, _CL_HEADS)
        state = state0.replace(
            params=_unflatten(p_flat), batch_stats=_unflatten(bs_flat))
        step = make_center_loss_train_step(
            model, lambda raw, rng, train: (raw["x"], raw["y"]),
            num_classes=n_classes, center_loss_weight=center_weight,
            momentum=MOMENTUM_Q, clipnorm=CLIPNORM,
            trainable_fn=(
                (lambda p: "cls_centroids" not in p) if frozen else None),
            l2_penalty_fn=lambda p: spec.l2_penalty(p["backbone"]),
        )
        lrs = [effective_lr(lr_q, DECAY, t) for t in range(STEPS)]
        state, our_losses = _run_ours(state, step, xs, ys, lrs)

    # Learnable centroids chase the (ReLU-kinked) embeddings, which doubles
    # the boundary-flip surface vs the frozen mode: at recipe lr a flip
    # lands mid-trajectory at a host-dependent step and amplifies to e-2
    # scale (frozen mode gates strictly on every host so far; see
    # _assert_losses docstring) — fork-tolerant tail.  The learnable
    # lr/100 variant gates the whole trajectory strictly.
    worst = _assert_losses(
        arch, ref_losses, our_losses,
        [("loss", "loss"), ("prob_loss", "ce"),
         ("center_loss_loss", "center_loss")],
        **({} if strict else {"rtol": 1e-3, "strict_rtol": 5e-5,
                              # post-fork amplification measured 8.5e-2 by
                              # step 10 on the r5 host; the envelope stays
                              # an order under the semantic-bug scale,
                              # which the strict window catches anyway
                              "fork_tail_rtol": 2e-1}))
    if frozen:
        np.testing.assert_array_equal(
            np.asarray(state.params["cls_centroids"], np.float64), fixed,
            err_msg="frozen centroids moved")
    _final_state_check(
        km, arch, state, state0,
        (str(tmp_path / "final.h5"), list(_CL_HEADS)), _CL_HEADS,
        f"center[frozen={frozen}]@lr{lr}/{arch} "
        f"(worst loss rel-err {worst:.2e})",
        # the fork envelope: a mid-trajectory flip moves final weights at
        # the same order as the loss tail (see _assert_losses); the
        # learnable strict variant pins everything at 1e-6 except the
        # label-gathered centroid table (mask-flip bound, docstring)
        **({"rtol_overrides": {"cls_centroids": 1e-3}} if strict and
           not frozen else ({} if strict else {"rtol": 1e-1})))


# ---------------------------------------------------------------------------
# Plain classifier (softmax CE + label smoothing)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_trajectory_classifier(ref_utils, ref_learners, float64_keras,  # noqa: F811
                               tmp_path):
    """The reference classifier (``build_network(n, arch, True)`` softmax
    net, targets smoothed by the reference's own ``transform_inputs``,
    legacy SGD momentum+decay+clipnorm, categorical_crossentropy) is
    reproduced by ``make_classifier_train_step``
    (``learn_classifier.py:17-22,146-147``).  CE is smooth, so the whole
    trajectory gates strictly like the flagship oracle."""
    import jax

    transform_inputs = ref_learners["learn_classifier"].transform_inputs
    arch, n_classes, batch, smoothing = "simple", 10, 20, 0.1

    km = ref_utils.build_network(n_classes, arch, True)
    _randomize_weights(km, seed=zlib.crc32(b"traj-classifier"))
    h5_init = str(tmp_path / "init.h5")
    km.save_weights(h5_init)

    km.compile(
        optimizer=tf_keras.optimizers.legacy.SGD(
            learning_rate=LR, momentum=0.9, nesterov=False, decay=DECAY,
            clipnorm=CLIPNORM),
        loss="categorical_crossentropy",
        metrics=["accuracy"],
    )
    xs, ys = _make_batches(STEPS, batch, 32, n_classes, seed=23)
    ref_losses = []
    for t in range(STEPS):
        x_t, y_t = transform_inputs(xs[t], ys[t], n_classes,
                                    label_smoothing=smoothing)
        ref_losses.append(_keras_losses(km, km.train_on_batch(x_t, y_t)))

    with jax.enable_x64(True):
        from semantic_embeddings_tpu.cli import common
        from semantic_embeddings_tpu.models import build_network
        from semantic_embeddings_tpu.train import make_classifier_train_step
        from semantic_embeddings_tpu.train.optimizer import effective_lr

        spec = build_network(n_classes, arch, classification=True)
        model = spec.module
        state0 = common.init_model_state(model, spec.input_size, 3)
        p_flat, bs_flat = _import_backbone(
            h5_init, arch, state0.params, state0.batch_stats, [],
            "classifier init", backbone_key=None)
        state = state0.replace(
            params=_unflatten(p_flat), batch_stats=_unflatten(bs_flat))
        step = make_classifier_train_step(
            model, lambda raw, rng, train: (raw["x"], raw["y"]),
            num_classes=n_classes, label_smoothing=smoothing,
            momentum=MOMENTUM_Q, clipnorm=CLIPNORM,
            l2_penalty_fn=spec.l2_penalty,
        )
        lrs = [effective_lr(LR_Q, DECAY, t) for t in range(STEPS)]
        state, our_losses = _run_ours(state, step, xs, ys, lrs)

    worst = _assert_losses(arch, ref_losses, our_losses, [("loss", "loss")])
    # Batch accuracy is an argmax readout: near-tied logits (gap ~1e-8 at
    # a random init) resolve differently across host CPU generations, so
    # allow a one-sample flip per step; the (smooth) loss trajectory above
    # still gates strictly, and a real prediction bug flips many samples.
    for t in range(STEPS):
        assert abs(float(our_losses[t]["acc"])
                   - ref_losses[t]["accuracy"]) <= 1.0 / batch + 1e-9, t
    _final_state_check(
        km, arch, state, state0, (str(tmp_path / "final.h5"), []), {},
        f"classifier/{arch} (worst loss rel-err {worst:.2e})",
        backbone_key=None)
