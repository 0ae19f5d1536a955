"""CIFAR-style SmallResNet (He et al. §4.2 variant with padded shortcuts).

Structural parity with ``/root/reference/models/cifar_resnet.py:69-257``:
3 stages of ``n`` two-conv blocks, identity shortcuts widened by average
pooling + zero channel padding (or 1x1 conv when ``conv_shortcut``), global
average pooling, and an optional top Dense named ``embedding``/``prob``.
The zero channel padding is a plain ``jnp.pad`` that XLA fuses into the
residual add — no custom layer needed on TPU.
"""

from __future__ import annotations

from typing import Any, Sequence

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
    global_max_pool,
    upcast32,
)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with a parameter-free (or 1x1-conv) shortcut."""

    in_features: int
    out_features: int
    stride: int = 1
    activation: str = "relu"
    conv_shortcut: bool = False
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        # A conv bias feeding BatchNorm is functionally dead: BN subtracts
        # the batch mean, so the loss is exactly invariant to it and its
        # gradient is exactly zero.  The reference carries these biases
        # (Keras Conv2D default, ``cifar_resnet.py:95``) at real cost on TPU
        # (bias-grad reduce fusions + per-variable clipnorm scalars);
        # dropping them is an exact equivalence — the Keras importer folds
        # any imported bias into the following BN's moving mean.
        bias = not self.use_bn
        y = conv(self.out_features, 3, self.stride, use_bias=bias,
                 name="conv_a", dtype=self.dtype)(x)
        if self.use_bn:
            y = KerasBatchNorm(dtype=self.dtype, name="bn_a")(y, train)
        y = act(y)
        y = conv(self.out_features, 3, use_bias=bias, name="conv_b",
                 dtype=self.dtype)(y)
        if self.use_bn:
            y = KerasBatchNorm(dtype=self.dtype, name="bn_b")(y, train)

        shortcut = x
        if self.in_features != self.out_features and self.conv_shortcut:
            shortcut = conv(
                self.out_features, 1, self.stride, use_bias=bias,
                name="conv_sc", dtype=self.dtype
            )(shortcut)
            if self.use_bn:
                shortcut = KerasBatchNorm(dtype=self.dtype, name="bn_sc")(
                    shortcut, train
                )
        else:
            if self.stride > 1:
                shortcut = avg_pool(shortcut, self.stride)
            if self.in_features < self.out_features:
                diff = self.out_features - self.in_features
                shortcut = channel_pad(shortcut, diff // 2, diff - diff // 2)
        return act(y + shortcut)


class SmallResNet(nn.Module):
    n: int = 9
    filters: Sequence[int] = (16, 32, 64)
    classes: int = 100
    include_top: bool = True
    top_activation: str | None = "softmax"
    activation: str = "relu"
    conv_shortcut: bool = False
    use_bn: bool = True
    pooling: str = "avg"
    #: rematerialize residual blocks: on bandwidth-bound TPU workloads this
    #: can REDUCE HBM traffic (recomputed block intermediates stay in VMEM)
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        block_cls = (
            nn.remat(ResidualBlock, static_argnums=(2,))
            if self.remat else ResidualBlock
        )
        x = conv(self.filters[0], 3, use_bias=not self.use_bn, name="conv0",
                 dtype=self.dtype)(x)
        if self.use_bn:
            x = KerasBatchNorm(dtype=self.dtype, name="bn0")(x, train)
        x = act(x)

        in_f = self.filters[0]
        for stage, out_f in enumerate(self.filters):
            stride = 1 if stage == 0 else 2
            for block in range(self.n):
                x = block_cls(
                    in_features=in_f if block == 0 else out_f,
                    out_features=out_f,
                    stride=stride if block == 0 else 1,
                    activation=self.activation,
                    conv_shortcut=self.conv_shortcut,
                    use_bn=self.use_bn,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x, train)
            in_f = out_f

        if self.pooling == "avg":
            x = global_avg_pool(x)
        elif self.pooling == "max":
            x = global_max_pool(x)
        self.sow("intermediates", "avg_pool", x)

        if self.include_top:
            x = dense(self.classes, name="top", dtype=self.dtype)(x)
            if self.top_activation == "softmax":
                x = nn.softmax(upcast32(x))
                self.sow("intermediates", "prob", x)
            else:
                self.sow("intermediates", "embedding", x)
        return x
