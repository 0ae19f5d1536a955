"""Keras-exact SGD with momentum, per-tensor norm clipping and time decay.

The reference trains everything with ``keras.optimizers.SGD(lr, decay,
momentum=0.9, nesterov, clipnorm=10)`` (``/root/reference/
learn_image_embeddings.py:229-236``).  The exact update differs from both
optax's and torch's SGD:

- ``clipnorm`` clips every gradient *tensor* to norm 10 individually —
  not the global norm (``optax.clip_by_global_norm`` is NOT equivalent).
- velocity: ``v <- momentum * v - lr * g``; plain momentum applies ``p += v``,
  Nesterov applies ``p += momentum * v_new - lr * g``.
- ``decay`` is per-iteration inverse time decay on the base LR:
  ``lr_t = lr / (1 + decay * iterations)`` — handled by the schedule driver
  (:func:`effective_lr`), not inside the update, so warm-restart callbacks
  compose the same way they do in Keras.

Exposed both as plain functions (used by the jitted train step, where the
learning rate is a traced scalar) and as an optax ``GradientTransformation``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def clip_by_per_tensor_norm(grads, clipnorm):
    """Keras ``clipnorm``: clip each gradient tensor to the given L2 norm."""
    if not clipnorm or clipnorm <= 0:
        return grads

    def clip(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        return g * (clipnorm / jnp.maximum(norm, clipnorm))

    return jax.tree_util.tree_map(clip, grads)


def init_velocity(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def l2_coef_tree(params, filters):
    """Per-leaf L2 coefficients from ``ModelSpec.l2_filters``-style
    (path-regex, coef) pairs; non-kernel leaves and unmatched paths get 0.

    Used to fold Keras kernel regularization into the gradient
    (``g + 2*coef*w``) instead of summing ``coef*||w||^2`` into the loss:
    identical gradients and update, but it avoids one scalar reduction per
    kernel in the forward AND stops XLA from fusing conv weight-gradients
    into VPU reduce fusions on TPU.
    """
    import re

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    coefs = []
    for path, _ in flat:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        coef = 0.0
        if names[-1] == "kernel":
            joined = "/".join(names[:-1])
            for pattern, c in filters:
                if re.search(pattern, joined):
                    coef = c
                    break
        coefs.append(coef)
    return jax.tree_util.tree_unflatten(treedef, coefs)


def apply_l2_grads(params, grads, coef_tree):
    """Adds the L2-regularization gradient ``2*coef*w`` (Keras ``l2(coef)``
    differentiates to exactly this) before clipping, like the reference's
    loss-side regularizers would."""
    return jax.tree_util.tree_map(
        lambda g, p, c: g + 2.0 * c * p if c else g, grads, params, coef_tree
    )


def sgd_update(params, velocity, grads, lr, momentum=0.9, nesterov=False,
               clipnorm=0.0):
    """One Keras-SGD step; returns ``(new_params, new_velocity)``."""
    grads = clip_by_per_tensor_norm(grads, clipnorm)

    def upd(p, v, g):
        v_new = momentum * v - lr * g
        if nesterov:
            p_new = p + momentum * v_new - lr * g
        else:
            p_new = p + v_new
        return p_new, v_new

    flat = jax.tree_util.tree_map(upd, params, velocity, grads)
    new_params = jax.tree_util.tree_map(
        lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple)
    )
    new_velocity = jax.tree_util.tree_map(
        lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple)
    )
    return new_params, new_velocity


def effective_lr(base_lr, decay, iterations):
    """Keras time-based decay: ``lr / (1 + decay * iterations)``."""
    if decay and decay > 0:
        return base_lr / (1.0 + decay * iterations)
    return base_lr


def decay_from_max_decay(max_decay, steps_per_epoch, epochs):
    """Derives the per-iteration decay from the reference's ``--max_decay``
    flag (``learn_image_embeddings.py:224-227``): the LR at the end of
    training is ``max_decay`` times the initial one."""
    if max_decay and max_decay > 0:
        return (1.0 / max_decay - 1.0) / (steps_per_epoch * epochs)
    return 0.0


class KerasSGDState(NamedTuple):
    velocity: optax.Updates


def keras_sgd(momentum=0.9, nesterov=False):
    """Keras-SGD as an optax ``GradientTransformation`` (LR applied by an
    outer ``optax.scale_by_learning_rate`` or injected via the update's
    ``lr``-scaled gradients is NOT equivalent — this transform expects
    gradients pre-multiplied by the learning rate).

    Per-tensor gradient clipping must be applied to the RAW gradients
    BEFORE the learning-rate scaling (Keras order) — use
    :func:`clip_by_per_tensor_norm`; a ``clipnorm`` here would see
    lr-scaled gradients and clip at the wrong threshold (an earlier
    revision accepted and silently ignored such an argument).
    """

    def init_fn(params):
        return KerasSGDState(velocity=init_velocity(params))

    def update_fn(lr_grads, state, params=None):
        del params
        v_new = jax.tree_util.tree_map(
            lambda v, g: momentum * v - g, state.velocity, lr_grads
        )
        if nesterov:
            updates = jax.tree_util.tree_map(
                lambda v, g: momentum * v - g, v_new, lr_grads
            )
        else:
            updates = v_new
        return updates, KerasSGDState(velocity=v_new)

    return optax.GradientTransformation(init_fn, update_fn)


def adagrad_update(params, accum, grads, lr, epsilon=1e-7):
    """Keras Adagrad (used by DeViSE, ``learn_devise.py:87,114``):
    ``a += g^2; p -= lr * g / (sqrt(a) + eps)``."""

    def upd(p, a, g):
        a_new = a + jnp.square(g)
        return p - lr * g / (jnp.sqrt(a_new) + epsilon), a_new

    flat = jax.tree_util.tree_map(upd, params, accum, grads)
    new_p = jax.tree_util.tree_map(
        lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple)
    )
    new_a = jax.tree_util.tree_map(
        lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple)
    )
    return new_p, new_a
