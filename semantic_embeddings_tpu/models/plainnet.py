"""Plain-11 architecture (Barz & Denzler, ICPRAI 2018).

Structural parity with ``/root/reference/models/plainnet.py:5-78``: a VGG-ish
stack described by a spec list (ints = 3x3 conv, ``'ap'``/``'mp'`` = pooling,
``'gap'`` = global average pooling, ``'fcN'`` = dense), with conv->act->BN
ordering and a final Dense named ``embedding``/``prob``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    KerasBatchNorm,
    activation_fn,
    avg_pool,
    conv,
    dense,
    global_avg_pool,
    max_pool,
    upcast32,
)

DEFAULT_FILTERS = (64, 64, "ap", 128, 128, 128, "ap", 256, 256, 256, "ap", 512, "gap", "fc512")


class PlainNet(nn.Module):
    output_dim: int
    filters: Sequence[Any] = DEFAULT_FILTERS
    activation: str = "relu"
    final_activation: str | None = None
    pool_size: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        flattened = False
        for i, f in enumerate(self.filters, start=1):
            if f == "mp":
                x = max_pool(x, self.pool_size)
            elif f == "ap":
                x = avg_pool(x, self.pool_size)
            elif f == "gap":
                x = global_avg_pool(x)
                self.sow("intermediates", "avg_pool", x)
                flattened = True
            elif isinstance(f, str) and f.startswith("fc"):
                if not flattened:
                    x = x.reshape((x.shape[0], -1))
                    flattened = True
                x = act(dense(int(f[2:]), name=f"fc{i}", dtype=self.dtype)(x))
                x = KerasBatchNorm(dtype=self.dtype, name=f"bn{i}")(x, train)
            else:
                x = act(conv(int(f), name=f"conv{i}", dtype=self.dtype)(x))
                x = KerasBatchNorm(dtype=self.dtype, name=f"bn{i}")(x, train)
        if not flattened:
            x = x.reshape((x.shape[0], -1))
        x = dense(self.output_dim, name="top", dtype=self.dtype)(x)
        if self.final_activation == "softmax":
            x = nn.softmax(upcast32(x))
            self.sow("intermediates", "prob", x)
        else:
            self.sow("intermediates", "embedding", x)
        return x
