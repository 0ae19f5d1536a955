"""Fine-tune-phase trajectory oracle vs the reference's own runtime.

The reference's ``--finetune`` path (``/root/reference/
learn_image_embeddings.py:183-207``) runs TWO phases:

1. warm-up: ``load_weights(by_name=True, skip_mismatch=True)``, freeze
   every layer except ``embedding``/``prob``, compile a FRESH
   ``SGD(lr=sgd_lr, momentum=.9, clipnorm)`` (no decay) and fit
   ``finetune_init`` epochs;
2. full: unfreeze everything, compile ANOTHER fresh SGD (velocity and
   iteration counter reset; decay active) and fit.

Frozen-BN semantics are the subtle part: under the reference's Keras 2.2
a ``trainable=False`` BatchNormalization still normalizes with BATCH
statistics and still updates its moving stats during fit — only gamma/
beta stop training.  Modern tf_keras BN instead switches to inference
mode when frozen (the TF2 behavior change), so this oracle does NOT use
``layer.trainable = False``: the warm-up phase is an explicit
GradientTape loop that calls the model with ``training=True`` (batch-stat
normalization + moving-stat updates for every BN — the Keras-2.2
behavior) and applies per-tensor-clipped momentum-SGD updates ONLY to the
``embedding``/``prob`` variables.  That is exactly what our
``trainable_fn`` gradient masking implements (zero gradient on frozen
params, batch_stats always updated in train mode), executed here against
the reference's own graph.

Phase 2 then compiles the reference's own ``train_on_batch`` loop with a
fresh legacy SGD (+decay) from the warm-up's end state, asserting the
fresh-optimizer reset (zero velocity, iteration counter back to 0) our
CLI performs at the warm->full transition.

The reference implementation is imported as an oracle only (sanctioned in
CLAUDE.md); nothing from it ships at runtime.
"""

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")
tf = pytest.importorskip("tensorflow")

from test_keras_import_oracle import _randomize_weights, ref_utils  # noqa: E402,F401
from test_train_trajectory_oracle import (  # noqa: E402
    CLIPNORM,
    LOSS_RTOL,
    LR_Q,
    MOMENTUM_Q,
    WEIGHT_RTOL,
    _assert_tree_close,
    _build_reference_training_model,
    _compile_reference,
    _import_trees,
    _make_batches,
    _unit_embedding,
    float64_keras,  # noqa: F401
)

WARM_STEPS = 4
FULL_STEPS = 5
DECAY = 0.3


def _warmup_keras22(km, warm_names, xs, ys, targets_fn, losses_fn):
    """Keras-2.2-semantics frozen warm-up: training-mode forward (every BN
    normalizes with batch stats and updates moving stats), per-tensor
    clipnorm, momentum-SGD applied ONLY to ``warm_names`` variables."""
    warm_vars = [v for layer in km.layers if layer.name in warm_names
                 for v in layer.trainable_weights]
    assert warm_vars, warm_names
    velocity = [tf.Variable(tf.zeros_like(v)) for v in warm_vars]
    losses = []
    for t in range(len(xs)):
        x = tf.constant(xs[t])
        with tf.GradientTape() as tape:
            out = km(x, training=True)
            loss = losses_fn(out, targets_fn(t)) + tf.add_n(km.losses)
        losses.append(float(loss))
        grads = tape.gradient(loss, warm_vars)
        for v, g, vel in zip(warm_vars, grads, velocity):
            g = tf.clip_by_norm(tf.cast(g, v.dtype), CLIPNORM)
            vel.assign(MOMENTUM_Q * vel - LR_Q * g)
            v.assign_add(vel)
    return losses


def _finetune_roundtrip(ref_utils, cls_weight, tmp_path, batch=8, size=16,
                        n_classes=10, embed_dim=16):
    import jax

    arch = "simple"
    cls_classes = n_classes if cls_weight > 0 else 0
    km = _build_reference_training_model(ref_utils, arch, embed_dim,
                                         cls_classes)
    _randomize_weights(km, seed=4242)
    h5_init = str(tmp_path / "pretrained.h5")
    km.save_weights(h5_init)

    embedding = _unit_embedding(n_classes, embed_dim)
    xs, ys = _make_batches(WARM_STEPS + FULL_STEPS, batch, size, n_classes,
                           seed=11)

    # ---- reference: phase 1 (Keras-2.2 frozen warm-up) ----
    def targets_fn(t):
        tgt = tf.constant(embedding[ys[t]])
        if cls_weight > 0:
            return tgt, tf.constant(np.eye(n_classes)[ys[t]])
        return tgt

    def losses_fn(out, tgt):
        if cls_weight > 0:
            emb_l = tf.reduce_mean(ref_utils.inv_correlation(tgt[0], out[0]))
            cls_l = tf.reduce_mean(tf_keras.losses.categorical_crossentropy(
                tgt[1], out[1]))
            return emb_l + cls_weight * cls_l
        return tf.reduce_mean(ref_utils.inv_correlation(tgt, out))

    warm_names = ("embedding", "prob")
    ref_warm_losses = _warmup_keras22(
        km, warm_names, xs[:WARM_STEPS], ys[:WARM_STEPS], targets_fn,
        losses_fn)

    # ---- reference: phase 2 (fresh compiled SGD with decay) ----
    _compile_reference(km, cls_weight, ref_utils, decay=DECAY)
    ref_full_losses = []
    for t in range(WARM_STEPS, WARM_STEPS + FULL_STEPS):
        tgt = embedding[ys[t]]
        if cls_weight > 0:
            out = km.train_on_batch(xs[t], [tgt, np.eye(n_classes)[ys[t]]])
            ref_full_losses.append(float(out[0]))
        else:
            ref_full_losses.append(float(km.train_on_batch(xs[t], tgt)))
    h5_final = str(tmp_path / "final.h5")
    km.save_weights(h5_final)

    # ---- ours: same two phases through make_train_step ----
    with jax.enable_x64(True):
        from semantic_embeddings_tpu.cli import common
        from semantic_embeddings_tpu.train import make_train_step
        from semantic_embeddings_tpu.train.optimizer import (
            effective_lr, init_velocity)

        model, spec = common.build_embedding_model(
            embed_dim, arch, "inv_corr", cls_classes)
        if cls_weight > 0:
            spec.l2_filters = [(r"^cls_top$", 5e-4)] + list(spec.l2_filters)
        state0 = common.init_model_state(model, size, 3, seed=0)
        params, batch_stats = _import_trees(
            h5_init, arch, cls_classes, state0.params, state0.batch_stats,
            "finetune init")
        state = state0.replace(params=params, batch_stats=batch_stats,
                               velocity=init_velocity(params))
        step_kwargs = dict(
            loss_name="inv_corr", class_embedding=embedding,
            num_classes=n_classes, cls_weight=cls_weight,
            l2_penalty_fn=spec.l2_penalty, momentum=MOMENTUM_Q,
            nesterov=False, clipnorm=CLIPNORM,
        )
        prepare = lambda raw, rng, train: (raw["x"], raw["y"])  # noqa: E731
        warm_step = make_train_step(
            model, prepare, trainable_fn=lambda p: "top" in p, **step_kwargs)
        full_step = make_train_step(model, prepare, **step_kwargs)
        rng = jax.random.PRNGKey(0)
        our_warm, our_full = [], []
        for t in range(WARM_STEPS):
            state, m = warm_step(state, {"x": xs[t], "y": ys[t]},
                                 np.float64(LR_Q), rng)
            our_warm.append(float(m["loss"]))
        # the CLI's warm->full transition: fresh optimizer (velocity +
        # iteration counter), like the reference's re-compile
        state = state.replace(velocity=init_velocity(state.params))
        for i, t in enumerate(range(WARM_STEPS, WARM_STEPS + FULL_STEPS)):
            lr = effective_lr(LR_Q, DECAY, i)
            state, m = full_step(state, {"x": xs[t], "y": ys[t]},
                                 np.float64(lr), rng)
            our_full.append(float(m["loss"]))
        state = jax.device_get(state)

    for name, ref_l, our_l in (("warm", ref_warm_losses, our_warm),
                               ("full", ref_full_losses, our_full)):
        for t, (r, o) in enumerate(zip(ref_l, our_l)):
            err = abs(o - r) / max(abs(r), 1e-2)
            assert err <= LOSS_RTOL, (
                f"{name} step {t}: ours {o!r} vs reference {r!r} "
                f"(rel err {err:.2e})")

    import flax

    ref_params, ref_bs = _import_trees(
        h5_final, arch, cls_classes, state0.params, state0.batch_stats,
        "finetune final")
    worst_w = _assert_tree_close(flax.core.unfreeze(state.params),
                                 ref_params, "finetune final params",
                                 rtol=WEIGHT_RTOL)
    # the frozen-BN moving stats updated during the warm-up on BOTH sides
    # (Keras-2.2 semantics) — this assertion is the divergence detector
    worst_bs = _assert_tree_close(flax.core.unfreeze(state.batch_stats),
                                  ref_bs, "finetune final batch_stats",
                                  rtol=WEIGHT_RTOL)
    print(f"finetune cls_weight={cls_weight}: worst param rel-err "
          f"{worst_w[0]:.2e} at {worst_w[1]}; worst batch-stat rel-err "
          f"{worst_bs[0]:.2e} at {worst_bs[1]}")


@pytest.mark.slow
def test_finetune_two_phase_oracle(ref_utils, float64_keras, tmp_path):
    """Warm-up (frozen backbone, constant lr, Keras-2.2 frozen-BN
    moving-stat updates) + full phase (fresh SGD with decay) reproduce
    the reference's losses, final params AND final BN statistics.
    (Slow-marked: a strict subset of the cls-head variant below, which
    stays in the default suite.)"""
    _finetune_roundtrip(ref_utils, 0.0, tmp_path)


def test_finetune_two_phase_oracle_cls_head(ref_utils, float64_keras,
                                            tmp_path):
    """The full finetune semantics in one run: cls_top trains during the
    warm-up while cls_bn's gamma/beta stay frozen but its moving stats
    update (the Keras-2.2 frozen-BN divergence detector), then the
    warm->full fresh-optimizer transition with decay."""
    _finetune_roundtrip(ref_utils, 0.1, tmp_path)
