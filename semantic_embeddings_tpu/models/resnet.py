"""ImageNet-scale ResNet family (v1 bottleneck / basic blocks).

Covers the reference's ``resnet-50/101/152`` (keras-applications backbones
wrapped with GAP + Dense at ``/root/reference/utils.py:228-243``) and the
``rn18/34/50/101/152/200`` keras-resnet variants (``utils.py:245-264``),
re-implemented as one configurable Flax module: 7x7/2 stem + 3x3/2 max-pool,
four stages of basic or bottleneck residual blocks, GAP, Dense head named
``embedding``/``prob``.

Convs are bias-free: every conv here feeds a BatchNorm, which subtracts the
batch mean, so the loss is exactly invariant to a conv bias and its gradient
is exactly zero.  keras-applications carries these dead biases (Conv2D
default) at measured cost on TPU (~2.1 ms/step of bias-grad reduce fusions
on the @224 fwd+bwd, plus per-variable clipnorm scalars in the train step);
the Keras importer folds any imported bias into the following BN's moving
mean (exactly equivalent).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import KerasBatchNorm, conv, dense, global_avg_pool, max_pool

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


def _bn(dtype, name):
    return KerasBatchNorm(momentum=0.99, epsilon=1.001e-5, dtype=dtype, name=name)


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        y = conv(f, 1, self.stride, use_bias=False, name="conv_a", dtype=self.dtype)(x)
        y = _bn(self.dtype, "bn_a")(y, train)
        y = nn.relu(y)
        y = conv(f, 3, use_bias=False, name="conv_b", dtype=self.dtype)(y)
        y = _bn(self.dtype, "bn_b")(y, train)
        y = nn.relu(y)
        y = conv(f * 4, 1, use_bias=False, name="conv_c", dtype=self.dtype)(y)
        y = _bn(self.dtype, "bn_c")(y, train)
        shortcut = x
        if self.project:
            shortcut = conv(f * 4, 1, self.stride, use_bias=False, name="conv_sc", dtype=self.dtype)(x)
            shortcut = _bn(self.dtype, "bn_sc")(shortcut, train)
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        y = conv(f, 3, self.stride, use_bias=False, name="conv_a", dtype=self.dtype)(x)
        y = _bn(self.dtype, "bn_a")(y, train)
        y = nn.relu(y)
        y = conv(f, 3, use_bias=False, name="conv_b", dtype=self.dtype)(y)
        y = _bn(self.dtype, "bn_b")(y, train)
        shortcut = x
        if self.project:
            shortcut = conv(f, 1, self.stride, use_bias=False, name="conv_sc", dtype=self.dtype)(x)
            shortcut = _bn(self.dtype, "bn_sc")(shortcut, train)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    depth: int = 50
    classes: int = 1000
    include_top: bool = True
    top_activation: str | None = None
    #: rematerialize residual blocks in the backward pass — trades ~30%
    #: extra forward FLOPs for O(depth) less activation memory; needed for
    #: large inputs (448px CUB/NAB recipes) at training batch sizes.
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        bottleneck = self.depth >= 50
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        x = conv(64, 7, 2, use_bias=False, name="conv0", dtype=self.dtype)(x)
        x = _bn(self.dtype, "bn0")(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding="SAME")

        for stage, n_blocks in enumerate(blocks):
            features = 64 * (2 ** stage)
            for b in range(n_blocks):
                x = block_cls(
                    features=features,
                    stride=2 if (b == 0 and stage > 0) else 1,
                    project=b == 0,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b + 1}",
                )(x, train)

        x = global_avg_pool(x)
        self.sow("intermediates", "avg_pool", x)

        if self.include_top:
            x = dense(self.classes, name="top", dtype=self.dtype)(x)
            if self.top_activation == "softmax":
                x = nn.softmax(x.astype(jnp.float32))
                self.sow("intermediates", "prob", x)
            else:
                self.sow("intermediates", "embedding", x)
        return x
