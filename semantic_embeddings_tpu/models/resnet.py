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
import jax
import jax.numpy as jnp

from .layers import KerasBatchNorm, conv, dense, global_avg_pool, max_pool, upcast32

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


def _bn(dtype, name, epsilon=1e-3):
    # Keras-2.2 parity: the BN epsilon differs per reference builder —
    # see ResNet.bn_epsilon.  Matters for imported reference .h5 models
    # (50+ BNs compound the difference).
    return KerasBatchNorm(momentum=0.99, epsilon=epsilon, dtype=dtype,
                          name=name)


class SpaceToDepthStem(nn.Module):
    """The 7x7/2 stem conv computed as a 4x4/1 conv over 2x2 space-to-depth
    input — mathematically identical, 4x the MXU lane utilization.

    A 7x7 stride-2 conv on 3-channel input runs at Cin/128 = 2.3% MXU lane
    utilization (stem fwd + weight-grad: ~1.4 ms of the 45 ms
    ResNet-50@224 v5e step).  Because the stride (2) divides the transform
    factor, the exact same linear map factors through space-to-depth with
    NO extra FLOPs (unlike stride-1 convs, SPEED.md "measured dead end"):
    pad the kernel 7->8, split every spatial tap u into (2a + di), and the
    conv becomes 4x4 stride-1 over (H/2, W/2, 4*Cin) — Cin 3 -> 12 lanes.
    MEASURED NET-NEUTRAL at @224 batch 128 (the stem conv ops disappear
    but the input transpose costs the saving back; SPEED.md r2) — opt-in.

    The parameter keeps the canonical (7, 7, Cin, F) shape and the ``conv0``
    name, so checkpoints, the h5 importer, finetuning and export are
    byte-compatible with the plain stem; the reshape to (4, 4, 4*Cin, F)
    happens in-graph (9 KB of weight shuffling per step — free).
    """

    features: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (7, 7, cin, self.features),
        )
        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        # Keras-2.2 stem alignment (ZeroPadding2D((3,3)) + VALID conv, see
        # ResNet.__call__): h+6 is even, so the 2x2 space-to-depth divides
        # it exactly and the 4x4 VALID conv lands on precisely h/2 rows.
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        hp = xp.shape[1] // 2
        wp = xp.shape[2] // 2
        s = xp.reshape(b, hp, 2, wp, 2, cin).transpose(0, 1, 3, 2, 4, 5)
        s = s.reshape(b, hp, wp, 4 * cin)
        # kernel: pad u,v 7->8, split u=2a+di, v=2b'+dj, channel order
        # (di, dj, c) matching the s2d transpose above
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
        if self.dtype is not None:
            s = s.astype(self.dtype)
            k4 = k4.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            s, k4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Conv1x1AsDot(nn.Module):
    """A 1x1 conv expressed as a flattened (B*H*W, Cin) @ (Cin, F) matmul.

    XLA:TPU's conv emitter places 56x56 stage-1 conv outputs in a
    batch-in-sublanes layout ({3,0,2,1}) and the surrounding 1x1-conv
    fusions then run at 1.4-2.4 TF/s / ~30-50 GB/s (traced; 25x off the
    HBM roofline).  A 1x1 conv has no spatial structure, so presenting it
    as a plain dot routes it through the GEMM emitter instead.  Parameter
    shape/name match ``nn.Conv`` ((1, 1, Cin, F) ``kernel``) for
    checkpoint/importer compatibility; stride 2 is a spatial subsample
    before the dot (exactly what a strided 1x1 conv computes).
    """

    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (1, 1, cin, self.features),
        )
        if self.stride != 1:
            x = x[:, ::self.stride, ::self.stride, :]
        b, h, w, _ = x.shape
        k = kernel[0, 0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = k.astype(self.dtype)
        y = jnp.dot(x.reshape(b * h * w, cin), k)
        return y.reshape(b, h, w, self.features)


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    conv1x1_as_dot: bool = False
    bn_epsilon: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def c1(features, stride, name):
            if self.conv1x1_as_dot:
                return Conv1x1AsDot(features, stride, dtype=self.dtype,
                                    name=name)
            return conv(features, 1, stride, use_bias=False, name=name,
                        kernel_init="he_normal", dtype=self.dtype)

        y = c1(f, self.stride, "conv_a")(x)
        y = _bn(self.dtype, "bn_a", self.bn_epsilon)(y, train)
        y = nn.relu(y)
        y = conv(f, 3, use_bias=False, name="conv_b",
                 kernel_init="he_normal", dtype=self.dtype)(y)
        y = _bn(self.dtype, "bn_b", self.bn_epsilon)(y, train)
        y = nn.relu(y)
        y = c1(f * 4, 1, "conv_c")(y)
        y = _bn(self.dtype, "bn_c", self.bn_epsilon)(y, train)
        shortcut = x
        if self.project:
            shortcut = c1(f * 4, self.stride, "conv_sc")(x)
            shortcut = _bn(self.dtype, "bn_sc", self.bn_epsilon)(
                shortcut, train)
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    bn_epsilon: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        y = conv(f, 3, self.stride, use_bias=False, name="conv_a",
                 kernel_init="he_normal", dtype=self.dtype)(x)
        y = _bn(self.dtype, "bn_a", self.bn_epsilon)(y, train)
        y = nn.relu(y)
        y = conv(f, 3, use_bias=False, name="conv_b",
                 kernel_init="he_normal", dtype=self.dtype)(y)
        y = _bn(self.dtype, "bn_b", self.bn_epsilon)(y, train)
        shortcut = x
        if self.project:
            shortcut = conv(f, 1, self.stride, use_bias=False, name="conv_sc",
                            kernel_init="he_normal", dtype=self.dtype)(x)
            shortcut = _bn(self.dtype, "bn_sc", self.bn_epsilon)(
                shortcut, train)
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
    #: compute the 7x7/2 stem as a 4x4/1 conv over space-to-depth input —
    #: mathematically identical (tested); measured NET-NEUTRAL on v5e @224
    #: batch 128 (stem conv fwd+dW ops disappear from the profile, ~1.4
    #: ms/step, but the input s2d transpose costs the same back: 46.9 vs
    #: 46.4 ms/step) — kept as an opt-in lever for other input geometries
    stem_s2d: bool = False
    #: express 1x1 convs as flattened GEMMs (Conv1x1AsDot) — probe flag
    conv1x1_as_dot: bool = False
    #: BatchNorm epsilon — differs per reference builder: the legacy
    #: ``keras.applications.ResNet50`` the reference pins for resnet-50
    #: (``/root/reference/utils.py:235-237``) never passes epsilon (Keras
    #: default 1e-3), while resnet-101/152 come from
    #: ``keras_applications.resnet`` (``utils.py:230-233``, the
    #: resnet_common implementation added in keras-applications 1.0.7)
    #: whose every BN hardcodes 1.001e-5.  build_network sets this per
    #: architecture; matters for imported reference ``.h5`` models.
    bn_epsilon: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        bottleneck = self.depth >= 50
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        # Keras-2.2 stem parity (keras_applications 1.0.8 resnet50.py —
        # the module `keras.applications.ResNet50` resolves to under the
        # reference's `keras == 2.2` pin): ZeroPadding2D((3,3)) + VALID
        # 7x7/2 conv, then ZeroPadding2D((1,1)) + VALID 3x3/2 max-pool.
        # Same output shapes as SAME at even inputs but one-pixel-shifted
        # receptive fields — imported .h5 models see the exact alignment
        # they were trained with.  (Zero-pad before max-pool is exact:
        # activations are post-relu, >= 0.)
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthStem(64, dtype=self.dtype, name="conv0")(x)
        else:
            x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            x = conv(64, 7, 2, use_bias=False, name="conv0",
                     padding="VALID", kernel_init="he_normal",
                     dtype=self.dtype)(x)
        x = _bn(self.dtype, "bn0", self.bn_epsilon)(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = max_pool(x, 3, 2, padding="VALID")

        for stage, n_blocks in enumerate(blocks):
            features = 64 * (2 ** stage)
            for b in range(n_blocks):
                extra = (
                    {"conv1x1_as_dot": self.conv1x1_as_dot}
                    if bottleneck else {}
                )
                x = block_cls(
                    features=features,
                    stride=2 if (b == 0 and stage > 0) else 1,
                    project=b == 0,
                    bn_epsilon=self.bn_epsilon,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b + 1}",
                    **extra,
                )(x, train)

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
