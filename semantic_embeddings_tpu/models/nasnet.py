"""NASNet-A (Zoph et al., CVPR 2018) — the "large" ImageNet configuration.

Fills the ``nasnet-a`` slot of the reference's architecture list
(``/root/reference/utils.py:266-272``, which wraps ``keras.applications.
NASNetLarge``).  Implemented from the paper's published NASNet-A cell
genotype: stem conv, two stem reduction cells, then three stages of N normal
cells separated by reduction cells, with the characteristic twice-applied
separable convolutions (relu -> sepconv -> BN, twice) and factorized
reduction of skip inputs.  NASNetLarge = N=6, penultimate filters 4032.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import KerasBatchNorm, avg_pool, dense, global_avg_pool, max_pool, upcast32


def _bn(dtype, name):
    return KerasBatchNorm(momentum=0.9997, epsilon=1e-3, dtype=dtype, name=name)


class SepConvBlock(nn.Module):
    """NASNet separable-conv unit: (relu -> depthwise+pointwise -> BN) x 2,
    the stride applied in the first application."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        for rep in range(2):
            x = nn.relu(x)
            x = nn.Conv(
                x.shape[-1], (self.kernel, self.kernel),
                strides=(self.stride if rep == 0 else 1,) * 2,
                padding="SAME", feature_group_count=x.shape[-1],
                use_bias=False, dtype=self.dtype, name=f"dw{rep}",
            )(x)
            x = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"pw{rep}",
            )(x)
            x = _bn(self.dtype, f"bn{rep}")(x, train)
        return x


class _Squeeze(nn.Module):
    """relu -> 1x1 conv -> BN projection to the cell's filter count."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return _bn(self.dtype, "bn")(x, train)


class _FactorizedReduce(nn.Module):
    """Halves spatial dims of a skip input via two offset stride-2 1x1 convs."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        p1 = nn.Conv(self.features // 2, (1, 1), strides=(2, 2),
                     use_bias=False, dtype=self.dtype, name="p1")(x)
        shifted = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = nn.Conv(self.features - self.features // 2, (1, 1),
                     strides=(2, 2), use_bias=False, dtype=self.dtype,
                     name="p2")(shifted)
        out = jnp.concatenate([p1, p2], axis=-1)
        return _bn(self.dtype, "bn")(out, train)


class _Adjust(nn.Module):
    """Brings the previous-cell output to the shape the cell expects."""

    features: int
    reduce_spatial: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, p, train=False):
        if p is None:
            return None
        if self.reduce_spatial:
            return _FactorizedReduce(self.features, dtype=self.dtype,
                                     name="factorize")(p, train)
        if p.shape[-1] != self.features:
            return _Squeeze(self.features, dtype=self.dtype, name="squeeze")(
                p, train
            )
        return p


class NormalCell(nn.Module):
    """NASNet-A normal cell (5 blocks, paper Fig. 4 left)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h_prev, h, train=False):
        p = _Adjust(
            self.features,
            reduce_spatial=(
                h_prev is not None and h_prev.shape[1] != h.shape[1]
            ),
            dtype=self.dtype, name="adjust",
        )(h_prev, train)
        h = _Squeeze(self.features, dtype=self.dtype, name="squeeze_h")(h, train)
        if p is None:
            p = h

        def sep(k, name):
            return SepConvBlock(self.features, k, dtype=self.dtype, name=name)

        b1 = sep(3, "b1_sep3h")(h, train) + h
        b2 = sep(3, "b2_sep3p")(p, train) + sep(5, "b2_sep5h")(h, train)
        b3 = avg_pool(h, 3, 1, padding="SAME") + p
        b4 = avg_pool(p, 3, 1, padding="SAME") + avg_pool(p, 3, 1, padding="SAME")
        b5 = sep(5, "b5_sep5p")(p, train) + sep(3, "b5_sep3p")(p, train)
        return jnp.concatenate([p, b1, b2, b3, b4, b5], axis=-1)


class ReductionCell(nn.Module):
    """NASNet-A reduction cell (5 blocks, paper Fig. 4 right); stride 2."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h_prev, h, train=False):
        raw = h
        p = _Adjust(
            self.features,
            reduce_spatial=(
                h_prev is not None and h_prev.shape[1] != h.shape[1]
            ),
            dtype=self.dtype, name="adjust",
        )(h_prev, train)
        h = _Squeeze(self.features, dtype=self.dtype, name="squeeze_h")(h, train)
        if p is None:
            # Keras's _adjust_block falls back to the RAW cell input (the
            # first stem reduction consumes the unprojected 96-ch stem on
            # its p path; the separable pointwises do the 96->F
            # projection).  Using the squeezed h here instead was the
            # round-1 13,446-param deficit vs keras NASNetLarge.
            p = raw

        def sep(k, name, stride=2):
            return SepConvBlock(self.features, k, stride, dtype=self.dtype,
                                name=name)

        b1 = sep(7, "b1_sep7p")(p, train) + sep(5, "b1_sep5h")(h, train)
        b2 = max_pool(h, 3, 2, padding="SAME") + sep(7, "b2_sep7p")(p, train)
        b3 = avg_pool(h, 3, 2, padding="SAME") + sep(5, "b3_sep5p")(p, train)
        b4 = max_pool(h, 3, 2, padding="SAME") + sep(
            3, "b4_sep3b1", stride=1
        )(b1, train)
        b5 = avg_pool(b1, 3, 1, padding="SAME") + b2
        return jnp.concatenate([b2, b3, b4, b5], axis=-1)


class NASNetA(nn.Module):
    """NASNet-A; defaults give the 'large' ImageNet model (~89M params)."""

    classes: int = 1000
    num_normal_cells: int = 6
    penultimate_filters: int = 4032
    stem_filters: int = 96
    include_top: bool = True
    top_activation: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        filters = self.penultimate_filters // 24  # 168 for NASNetLarge

        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = _bn(self.dtype, "stem_bn")(x, train)

        prev, cur = None, x
        prev, cur = cur, ReductionCell(
            filters // 4, dtype=self.dtype, name="stem_reduce1"
        )(prev, cur, train)
        prev, cur = cur, ReductionCell(
            filters // 2, dtype=self.dtype, name="stem_reduce2"
        )(prev, cur, train)

        for stage in range(3):
            stage_filters = filters * (2 ** stage)
            if stage > 0:
                prev, cur = cur, ReductionCell(
                    stage_filters, dtype=self.dtype, name=f"reduce{stage}"
                )(prev, cur, train)
            for i in range(self.num_normal_cells):
                prev, cur = cur, NormalCell(
                    stage_filters, dtype=self.dtype,
                    name=f"s{stage}_cell{i}",
                )(prev, cur, train)

        x = nn.relu(cur)
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
