"""Wide Residual Network (Zagoruyko & Komodakis) — WRN-28-10 for CIFAR.

Structural parity with ``/root/reference/models/wide_residual_network.py:
8-101``: he-normal bias-free convs, BatchNorm momentum 0.1 / eps 1e-5, one
``expand`` block (conv-BN-relu-conv + 1x1 skip conv) followed by ``N-1``
pre-activation blocks per group, widths ``[16, 32, 64] * k``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import KerasBatchNorm, conv, dense, global_avg_pool, keras_uniform, upcast32


def _bn(dtype, name):
    # The reference passes gamma_initializer='uniform' on every BN
    # (wide_residual_network.py:14,25,44,51,...): Keras 'uniform' is
    # RandomUniform(-0.05, 0.05), NOT ones.
    return KerasBatchNorm(
        momentum=0.1, epsilon=1e-5, scale_init=keras_uniform,
        dtype=dtype, name=name,
    )


class WideResNet(nn.Module):
    classes: int = 100
    n_blocks: int = 4  # N in WRN-(6N+4)-k
    width: int = 10
    dropout: float = 0.0
    final_activation: str | None = "softmax"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_init="he_normal", use_bias=False, dtype=self.dtype)
        x = conv(16, 3, name="conv0", **kw)(x)
        x = _bn(self.dtype, "bn0")(x, train)
        x = nn.relu(x)

        for g, base in enumerate((16, 32, 64)):
            feats = base * self.width
            stride = 2 if g > 0 else 1
            # Expansion block: two convs + 1x1 strided skip (no BN on skip).
            y = conv(feats, 3, stride, name=f"g{g}_expand_a", **kw)(x)
            y = _bn(self.dtype, f"g{g}_expand_bn")(y, train)
            y = nn.relu(y)
            y = conv(feats, 3, name=f"g{g}_expand_b", **kw)(y)
            skip = conv(feats, 1, stride, name=f"g{g}_skip", **kw)(x)
            x = y + skip

            for b in range(self.n_blocks - 1):
                y = _bn(self.dtype, f"g{g}_b{b}_bn_a")(x, train)
                y = nn.relu(y)
                y = conv(feats, 3, name=f"g{g}_b{b}_conv_a", **kw)(y)
                if self.dropout > 0:
                    y = nn.Dropout(self.dropout, deterministic=not train)(y)
                y = _bn(self.dtype, f"g{g}_b{b}_bn_b")(y, train)
                y = nn.relu(y)
                y = conv(feats, 3, name=f"g{g}_b{b}_conv_b", **kw)(y)
                x = x + y

            x = _bn(self.dtype, f"g{g}_bn_out")(x, train)
            x = nn.relu(x)

        x = global_avg_pool(x)
        self.sow("intermediates", "avg_pool", x)
        x = dense(self.classes, name="top", dtype=self.dtype)(x)
        if self.final_activation == "softmax":
            x = nn.softmax(upcast32(x))
            self.sow("intermediates", "prob", x)
        else:
            self.sow("intermediates", "embedding", x)
        return x
