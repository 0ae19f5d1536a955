"""Train/eval steps for the baseline learners (label embedding, center loss).

Loss semantics from ``/root/reference/learn_labelembedding.py:17-37,146`` and
``learn_center_loss.py:35-39,138-139``; both use the Keras-exact SGD update.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import losses as L
from .state import TrainState
from .trainer import finish_sgd_step


def make_labelembed_train_step(
    model,
    prepare: Callable,
    *,
    tau=2.0,
    alpha=0.9,
    beta=0.5,
    momentum=0.9,
    nesterov=False,
    clipnorm=10.0,
    trainable_fn=None,
    donate=False,
    l2_penalty_fn=None,
):
    """``l2_penalty_fn``: Keras kernel regularization — the reference's
    backbone carries per-arch l2 regularizers (utils.build_network) while
    the learner's added heads do not; pass a penalty scoped to the
    backbone subtree."""
    def step(state: TrainState, raw_batch, lr, rng):
        images, labels = prepare(raw_batch, rng, True)

        def loss_fn(params):
            (emb, out1, out2, tar), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, labels, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            per_sample = L.labelembed_loss(
                out1, out2, tar, labels, tau=tau, alpha=alpha, beta=beta
            )
            total = per_sample.mean()
            if l2_penalty_fn is not None:
                total = total + l2_penalty_fn(params)
            metrics = {
                "loss": total,
                "acc": (jnp.argmax(out1, -1) == labels)
                .astype(jnp.float32).mean(),
            }
            return total, (mut["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = finish_sgd_step(
            state, grads, new_bs, lr, momentum=momentum, nesterov=nesterov,
            clipnorm=clipnorm, trainable_fn=trainable_fn,
        )
        return new_state, metrics

    return jax.jit(step, **({"donate_argnums": (0,)} if donate else {}))


def make_labelembed_eval_step(model, prepare, *, tau=2.0, alpha=0.9, beta=0.5,
                              l2_penalty_fn=None):
    def step(state: TrainState, raw_batch, rng):
        images, labels = prepare(raw_batch, rng, False)
        valid = raw_batch.get("valid")
        mask = (
            jnp.ones(images.shape[0], jnp.float32)
            if valid is None else valid.astype(jnp.float32)
        )
        emb, out1, out2, tar = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, labels, train=False,
        )
        per_sample = L.labelembed_loss(
            out1, out2, tar, labels, tau=tau, alpha=alpha, beta=beta,
            valid=mask,
        )
        out = {
            "emb_loss": (per_sample * mask).sum(),
            "cls_correct": (
                (jnp.argmax(out1, -1) == labels).astype(jnp.float32) * mask
            ).sum(),
            "pred": jnp.argmax(out1, -1),
            "count": mask.sum(),
        }
        # Keras's evaluate folds model.losses (the L2 kernel penalty) into
        # val_loss; --snapshot_best / plateau monitor that total.
        if l2_penalty_fn is not None:
            out["total_loss"] = out["emb_loss"] + (
                l2_penalty_fn(state.params) * mask.sum()
            )
        return out

    return jax.jit(step)


def make_center_loss_train_step(
    model,
    prepare: Callable,
    *,
    num_classes,
    center_loss_weight=0.1,
    momentum=0.9,
    nesterov=False,
    clipnorm=10.0,
    trainable_fn=None,
    donate=False,
    l2_penalty_fn=None,
):
    def step(state: TrainState, raw_batch, lr, rng):
        images, labels = prepare(raw_batch, rng, True)
        onehot = jax.nn.one_hot(labels, num_classes)

        def loss_fn(params):
            (emb, prob, center_dist), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, labels, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            ce = L.categorical_crossentropy(onehot, prob).mean()
            cl = center_dist.mean()
            total = ce + center_loss_weight * cl
            if l2_penalty_fn is not None:
                total = total + l2_penalty_fn(params)
            metrics = {
                "loss": total,
                "ce": ce,
                "center_loss": cl,
                "acc": (jnp.argmax(prob, -1) == labels)
                .astype(jnp.float32).mean(),
            }
            return total, (mut["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = finish_sgd_step(
            state, grads, new_bs, lr, momentum=momentum, nesterov=nesterov,
            clipnorm=clipnorm, trainable_fn=trainable_fn,
        )
        return new_state, metrics

    return jax.jit(step, **({"donate_argnums": (0,)} if donate else {}))


def make_center_loss_eval_step(model, prepare, *, num_classes,
                               center_loss_weight=0.1, l2_penalty_fn=None):
    def step(state: TrainState, raw_batch, rng):
        images, labels = prepare(raw_batch, rng, False)
        valid = raw_batch.get("valid")
        mask = (
            jnp.ones(images.shape[0], jnp.float32)
            if valid is None else valid.astype(jnp.float32)
        )
        onehot = jax.nn.one_hot(labels, num_classes)
        emb, prob, center_dist = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, labels, train=False,
        )
        ce = L.categorical_crossentropy(onehot, prob)
        out = {
            "emb_loss": ((ce + center_loss_weight * center_dist) * mask).sum(),
            "cls_correct": (
                (jnp.argmax(prob, -1) == labels).astype(jnp.float32) * mask
            ).sum(),
            "pred": jnp.argmax(prob, -1),
            "count": mask.sum(),
        }
        # Keras folds the L2 kernel penalty into val_loss (see
        # make_labelembed_eval_step).
        if l2_penalty_fn is not None:
            out["total_loss"] = out["emb_loss"] + (
                l2_penalty_fn(state.params) * mask.sum()
            )
        return out

    return jax.jit(step)
