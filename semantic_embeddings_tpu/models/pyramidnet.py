"""PyramidNet for CIFAR (Han et al., linearly growing channel counts).

Structural parity with ``/root/reference/models/cifar_pyramidnet.py:31-191``:
BN-first basic/bottleneck blocks, zero-padded shortcuts, channel count grown
by ``alpha / (3n)`` before every block, final BN + activation + GAP + Dense.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    KerasBatchNorm,
    activation_fn,
    avg_pool,
    channel_pad,
    conv,
    dense,
    global_avg_pool,
    upcast32,
)


class PyramidBlock(nn.Module):
    features: int
    stride: int = 1
    bottleneck: bool = True
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        # Every conv here feeds a BatchNorm, so conv biases are functionally
        # dead (loss exactly invariant, gradient exactly zero); the reference
        # carries them (Keras Conv2D default, ``cifar_pyramidnet.py``) — see
        # cifar_resnet.ResidualBlock for the rationale and importer folding.
        kw = dict(kernel_init="glorot_normal", use_bias=False, dtype=self.dtype)
        n = self.features
        if self.bottleneck:
            s = KerasBatchNorm(dtype=self.dtype, name="bn_in")(x, train)
            s = conv(n, 1, name="conv_a", **kw)(s)
            s = KerasBatchNorm(dtype=self.dtype, name="bn_a")(s, train)
            s = act(s)
            s = conv(n, 3, self.stride, name="conv_b", **kw)(s)
            s = KerasBatchNorm(dtype=self.dtype, name="bn_b")(s, train)
            s = act(s)
            s = conv(n * 4, 1, name="conv_c", **kw)(s)
            s = KerasBatchNorm(dtype=self.dtype, name="bn_c")(s, train)
            out_features = n * 4
        else:
            s = KerasBatchNorm(dtype=self.dtype, name="bn_in")(x, train)
            s = conv(n, 3, self.stride, name="conv_a", **kw)(s)
            s = KerasBatchNorm(dtype=self.dtype, name="bn_a")(s, train)
            s = act(s)
            s = conv(n, 3, name="conv_b", **kw)(s)
            s = KerasBatchNorm(dtype=self.dtype, name="bn_b")(s, train)
            out_features = n

        shortcut = x
        if self.stride > 1:
            shortcut = avg_pool(shortcut, self.stride)
        in_features = x.shape[-1]
        if in_features < out_features:
            shortcut = channel_pad(shortcut, 0, out_features - in_features)
        return s + shortcut


class PyramidNet(nn.Module):
    depth: int = 272
    alpha: int = 200
    bottleneck: bool = True
    classes: int = 100
    include_top: bool = True
    top_activation: str | None = "softmax"
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        n = (self.depth - 2) // (9 if self.bottleneck else 6)
        add_channel = float(self.alpha) / (3 * n)

        x = conv(16, 3, name="conv0", kernel_init="glorot_normal",
                 use_bias=False, dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype, name="bn0")(x, train)

        channels = 16.0
        for stage in range(3):
            for block in range(n):
                channels += add_channel
                x = PyramidBlock(
                    features=round(channels),
                    stride=2 if (stage > 0 and block == 0) else 1,
                    bottleneck=self.bottleneck,
                    activation=self.activation,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x, train)

        x = KerasBatchNorm(dtype=self.dtype, name="bn_final")(x, train)
        x = act(x)
        x = global_avg_pool(x)
        self.sow("intermediates", "avg_pool", x)

        if self.include_top:
            x = dense(self.classes, name="top", dtype=self.dtype)(x)
            if self.top_activation == "softmax":
                x = nn.softmax(upcast32(x))
                self.sow("intermediates", "prob", x)
            else:
                self.sow("intermediates", "embedding", x)
        return x
