"""Shared building blocks for the Flax model zoo.

Keras-semantic defaults are preserved where they affect training parity:
glorot-uniform kernel init, BatchNorm momentum 0.99 / epsilon 1e-3 (per-model
overrides where the reference deviates), SAME padding, NHWC layout.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import (
    glorot_normal,
    glorot_uniform,
    he_normal,
    lecun_normal,
)

INITIALIZERS = {
    "glorot_uniform": glorot_uniform,
    "glorot_normal": glorot_normal,
    "he_normal": he_normal,
    "lecun_normal": lecun_normal,
}

ACTIVATIONS = {
    "relu": nn.relu,
    "selu": nn.selu,
    None: lambda x: x,
}


def upcast32(x):
    """Upcast-only stability cast: bf16/f16 -> f32, f32 -> f32, f64 -> f64.

    Used where mixed-precision models need at-least-f32 math (BN statistics,
    l2norm, softmax).  A hard ``astype(float32)`` would *truncate* float64
    under ``jax.enable_x64`` — which the Keras-runtime trajectory oracle
    (tests/test_train_trajectory_oracle.py) runs in — injecting ~1e-8
    noise per step; promotion keeps TPU behavior identical (everything is
    <= f32 there) while staying exact in x64 parity tests.
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def keras_uniform(key, shape, dtype=jnp.float32):
    """Keras 'uniform' initializer: RandomUniform(-0.05, 0.05)."""
    import jax

    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


def activation_fn(name) -> Callable:
    if callable(name):
        return name
    return ACTIVATIONS[name]


def channel_pad(x, before, after):
    """Zero-padding along the channel axis.

    TPU-native form of the reference's parameter-free shortcut widening
    (``ChannelPadding``, ``/root/reference/models/cifar_resnet.py:28-66``):
    just a pad on the trailing axis, which XLA fuses into the adjacent add.
    """
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (int(before), int(after))))


def avg_pool(x, window, stride=None, padding="VALID",
             count_include_pad=True):
    """``count_include_pad=False`` gives Keras/TF AveragePooling2D
    semantics at SAME padding (border windows divide by the number of
    VALID cells, not the window size) — matters for NASNet's in-cell
    3x3/1 SAME average pools; all VALID uses are unaffected."""
    stride = stride or window
    return nn.avg_pool(
        x, (window, window), strides=(stride, stride), padding=padding,
        count_include_pad=count_include_pad,
    )


def max_pool(x, window, stride=None, padding="VALID"):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def global_max_pool(x):
    return jnp.max(x, axis=(1, 2))


# Default batch-statistics group count consulted by KerasBatchNorm when a
# module instance doesn't pin its own `groups`.  1 = global-batch (sync) BN —
# the framework default.  Set to the data-parallel degree (via
# set_default_bn_groups / the CLIs' --bn_per_replica) to reproduce the
# reference's per-tower BN (`keras.utils.multi_gpu_model` computes BN
# statistics independently per GPU tower,
# `/root/reference/learn_image_embeddings.py:133`).  Affects model TRACING:
# set it before the train/eval step is built.
DEFAULT_BN_GROUPS = 1


def set_default_bn_groups(groups: int):
    global DEFAULT_BN_GROUPS
    DEFAULT_BN_GROUPS = max(1, int(groups))


class _GroupedBatchNorm(nn.Module):
    """BatchNorm computing statistics independently per batch group.

    With the leading batch axis sharded over N chips and ``groups=N``, each
    group's reduction stays chip-local (no cross-replica collective) — the
    exact semantics of the reference's per-tower BN under
    ``multi_gpu_model``, and marginally cheaper than sync BN.  Running
    statistics are updated with the aggregated whole-batch moments (mean of
    group means; law-of-total-variance for the variance), so inference
    matches sync-BN inference.

    Parameter/stat tree layout matches ``nn.BatchNorm`` so checkpoints and
    the h5 importer are interchangeable between modes.
    """

    groups: int
    momentum: float = 0.99
    epsilon: float = 1e-3
    scale_init: Callable = nn.initializers.ones
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))
        out_dtype = self.dtype or x.dtype
        xf = upcast32(x)
        if not train:
            inv = scale / jnp.sqrt(ra_var.value + self.epsilon)
            return ((xf - ra_mean.value) * inv + bias).astype(out_dtype)

        g = self.groups
        if x.shape[0] % g:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by bn groups {g}")
        xg = xf.reshape((g, x.shape[0] // g) + x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))  # per-group batch+spatial axes
        gmean = xg.mean(red)  # (g, C)
        gvar = ((xg - gmean.reshape((g,) + (1,) * len(red) + (feat,))) ** 2
                ).mean(red)
        bshape = (g,) + (1,) * len(red) + (feat,)
        y = (xg - gmean.reshape(bshape)) / jnp.sqrt(
            gvar.reshape(bshape) + self.epsilon)
        y = (y * scale + bias).reshape(x.shape).astype(out_dtype)
        if not self.is_initializing():
            bmean = gmean.mean(0)
            bvar = gvar.mean(0) + gmean.var(0)  # law of total variance
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * bmean
            ra_var.value = m * ra_var.value + (1.0 - m) * bvar
        return y


class KerasBatchNorm(nn.Module):
    """BatchNorm with Keras defaults (momentum 0.99, eps 1e-3).

    Under pjit with the batch axis sharded across the mesh, the batch
    statistics are global-batch statistics: XLA lowers the mean/variance
    reductions to cross-replica collectives automatically, so data-parallel
    training uses synchronized BN by construction.  ``groups`` (or the
    module-level :data:`DEFAULT_BN_GROUPS`) switches to per-group
    statistics reproducing the reference's per-tower BN — see
    :class:`_GroupedBatchNorm` and PARITY.md §BN.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    scale_init: Callable = nn.initializers.ones
    dtype: jnp.dtype | None = None
    groups: int | None = None  # None: use DEFAULT_BN_GROUPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = self.groups if self.groups is not None else DEFAULT_BN_GROUPS
        if groups > 1:
            return _GroupedBatchNorm(
                groups=groups,
                momentum=self.momentum,
                epsilon=self.epsilon,
                scale_init=self.scale_init,
                dtype=self.dtype,
                name="BatchNorm_0",  # same tree layout as nn.BatchNorm
            )(x, train=train)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            scale_init=self.scale_init,
            dtype=self.dtype,
        )(x)


def conv(
    features,
    kernel=3,
    stride=1,
    use_bias=True,
    kernel_init="glorot_uniform",
    name=None,
    dtype=None,
    padding="SAME",
):
    """3x3-style SAME conv with Keras-like defaults."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        kernel_init=INITIALIZERS[kernel_init](),
        name=name,
        dtype=dtype,
    )


def dense(features, kernel_init="glorot_uniform", name=None, dtype=None):
    return nn.Dense(
        features, kernel_init=INITIALIZERS[kernel_init](), name=name, dtype=dtype
    )
