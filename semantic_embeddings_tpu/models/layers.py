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


def avg_pool(x, window, stride=None, padding="VALID"):
    stride = stride or window
    return nn.avg_pool(
        x, (window, window), strides=(stride, stride), padding=padding
    )


def max_pool(x, window, stride=None, padding="VALID"):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def global_max_pool(x):
    return jnp.max(x, axis=(1, 2))


class KerasBatchNorm(nn.Module):
    """BatchNorm with Keras defaults (momentum 0.99, eps 1e-3).

    Under pjit with the batch axis sharded across the mesh, the batch
    statistics are global-batch statistics: XLA lowers the mean/variance
    reductions to cross-replica collectives automatically, so data-parallel
    training uses synchronized BN by construction.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    scale_init: Callable = nn.initializers.ones
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
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
):
    """3x3-style SAME conv with Keras-like defaults."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=INITIALIZERS[kernel_init](),
        name=name,
        dtype=dtype,
    )


def dense(features, kernel_init="glorot_uniform", name=None, dtype=None):
    return nn.Dense(
        features, kernel_init=INITIALIZERS[kernel_init](), name=name, dtype=dtype
    )
