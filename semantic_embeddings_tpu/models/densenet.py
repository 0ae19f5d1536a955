"""DenseNet for CIFAR (Huang et al.) — 100-12, 100-24 and BC-190-40 variants.

Structural parity with the reference's vendored implementation
(``/root/reference/models/DenseNet/densenet.py:451-661``): BN(eps 1.1e-5) ->
relu -> [1x1 bottleneck 4k] -> 3x3 conv growth blocks with channel
concatenation, compressed 1x1 + avg-pool transitions, he-normal bias-free
convs, final BN + relu + GAP + Dense.

Only the initial conv, bottleneck 1x1s and transition 1x1s carry L2 weight
decay in the reference; the 3x3 growth convs do not — the layer names here
(``conv_init`` / ``*_neck`` / ``*_trans`` vs ``*_grow``) encode that so the
trainer's L2 filter can reproduce it exactly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (KerasBatchNorm, avg_pool, conv, dense, global_avg_pool,
                     max_pool, upcast32)


def _bn(dtype, name):
    return KerasBatchNorm(momentum=0.99, epsilon=1.1e-5, dtype=dtype, name=name)


def sub_pixel_upscale(x, scale=2):
    """Sub-pixel (depth-to-space) upscaling.

    TPU-native equivalent of the reference's ``SubPixelUpscaling`` layer and
    its TF/Theano ``depth_to_space`` backends
    (``/root/reference/models/DenseNet/subpixel.py:16``): one reshape +
    transpose that XLA fuses away.
    """
    b, h, w, c = x.shape
    oc = c // (scale * scale)
    x = x.reshape(b, h, w, scale, scale, oc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * scale, w * scale, oc)


class DenseNetFCN(nn.Module):
    """Fully-convolutional DenseNet (Tiramisu-style encoder/decoder).

    Functional counterpart of the reference's vendored ``DenseNetFCN``
    (``/root/reference/models/DenseNet/densenet.py:256-363,665+``): dense
    blocks down a maxpool path with skip connections, upsampling via
    transposed conv / sub-pixel shuffle, and a 1x1 classifier head.
    """

    classes: int = 12
    nb_dense_block: int = 5
    growth_rate: int = 16
    layers_per_block: int = 4
    init_conv_filters: int = 48
    upsampling_type: str = "deconv"  # 'deconv' | 'subpixel' | 'upsampling'
    top_activation: str | None = "softmax"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_init="he_normal", use_bias=False, dtype=self.dtype)

        def dense_block(x, prefix):
            feats = []
            for i in range(self.layers_per_block):
                y = _bn(self.dtype, f"{prefix}_l{i}_bn")(x, train)
                y = nn.relu(y)
                y = conv(self.growth_rate, 3, name=f"{prefix}_l{i}_grow", **kw)(y)
                feats.append(y)
                x = jnp.concatenate([x, y], axis=-1)
            return x, jnp.concatenate(feats, axis=-1)

        def upsample(x, prefix):
            feats = x.shape[-1]
            if self.upsampling_type == "upsampling":
                b, h, w, c = x.shape
                return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            if self.upsampling_type == "subpixel":
                y = conv(feats * 4, 3, name=f"{prefix}_sp", **kw)(nn.relu(x))
                return sub_pixel_upscale(y, 2)
            return nn.ConvTranspose(
                feats, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"{prefix}_deconv",
            )(nn.relu(x))

        x = conv(self.init_conv_filters, 3, name="conv_init", **kw)(x)

        skips = []
        for d in range(self.nb_dense_block):
            x, _ = dense_block(x, f"down{d}")
            skips.append(x)
            # transition down: BN-relu-1x1 conv + 2x2 max pool
            y = _bn(self.dtype, f"down{d}_td_bn")(x, train)
            y = nn.relu(y)
            y = conv(x.shape[-1], 1, name=f"down{d}_td_conv", **kw)(y)
            x = max_pool(y, 2)

        x, new_feats = dense_block(x, "bottleneck")
        x = new_feats  # only the newly produced features go up

        for d in reversed(range(self.nb_dense_block)):
            x = upsample(x, f"up{d}")
            skip = skips[d]
            # Crop to the skip's spatial dims if deconv overshoots odd sizes.
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            x = jnp.concatenate([x, skip], axis=-1)
            _, x = dense_block(x, f"up{d}")

        x = conv(self.classes, 1, name="head", kernel_init="he_normal",
                 use_bias=True, dtype=self.dtype)(x)
        if self.top_activation == "softmax":
            x = nn.softmax(upcast32(x))
        return x


class DenseNet(nn.Module):
    classes: int = 100
    depth: int = 100
    growth_rate: int = 12
    nb_dense_block: int = 3
    bottleneck: bool = False
    reduction: float = 0.0
    nb_filter: int = -1
    dropout: float = 0.0
    include_top: bool = True
    top_activation: str | None = "softmax"
    subsample_initial_block: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_init="he_normal", use_bias=False, dtype=self.dtype)
        count = (self.depth - 4) // 3
        if self.bottleneck:
            count //= 2
        layers_per_block = [count] * self.nb_dense_block
        nb_filter = self.nb_filter if self.nb_filter > 0 else 2 * self.growth_rate
        compression = 1.0 - self.reduction

        if self.subsample_initial_block:
            x = conv(nb_filter, 7, 2, name="conv_init", **kw)(x)
            x = _bn(self.dtype, "bn_init")(x, train)
            x = nn.relu(x)
            x = max_pool(x, 3, 2, padding="SAME")
        else:
            x = conv(nb_filter, 3, name="conv_init", **kw)(x)

        for block_idx, n_layers in enumerate(layers_per_block):
            for i in range(n_layers):
                prefix = f"b{block_idx}_l{i}"
                y = _bn(self.dtype, f"{prefix}_bn")(x, train)
                y = nn.relu(y)
                if self.bottleneck:
                    y = conv(4 * self.growth_rate, 1, name=f"{prefix}_neck", **kw)(y)
                    y = _bn(self.dtype, f"{prefix}_neck_bn")(y, train)
                    y = nn.relu(y)
                y = conv(self.growth_rate, 3, name=f"{prefix}_grow", **kw)(y)
                if self.dropout > 0:
                    y = nn.Dropout(self.dropout, deterministic=not train)(y)
                x = jnp.concatenate([x, y], axis=-1)
                nb_filter += self.growth_rate
            if block_idx != self.nb_dense_block - 1:
                x = _bn(self.dtype, f"b{block_idx}_trans_bn")(x, train)
                x = nn.relu(x)
                nb_filter = int(nb_filter * compression)
                x = conv(nb_filter, 1, name=f"b{block_idx}_trans", **kw)(x)
                x = avg_pool(x, 2)

        x = _bn(self.dtype, "bn_final")(x, train)
        x = nn.relu(x)
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
