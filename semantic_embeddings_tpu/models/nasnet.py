"""NASNet-A (Zoph et al., CVPR 2018) — the "large" ImageNet configuration.

Fills the ``nasnet-a`` slot of the reference's architecture list
(``/root/reference/utils.py:266-272``, which wraps ``keras.applications.
NASNetLarge``).  Wiring is keras-exact (oracle-verified forward parity in
``tests/test_keras_import_oracle.py``): VALID-padded stem conv, two stem
reduction cells, three stages of N normal cells separated by reduction
cells with the ``skip_reduction=True`` skip wiring of NASNetLarge (the
p-input of the first normal cell after a reduction comes from TWO normal
cells back — the reduction is skipped on the p path), keras's cell concat
orders, and the twice-applied separable convolutions
(relu -> depthwise+pointwise -> BN, twice).  NASNetLarge = N=6,
penultimate filters 4032.

Padding note: keras's ``correct_pad`` + VALID around its stride-2 convs
and pools is arithmetically identical to TF SAME padding at every input
parity (pad_total = (ceil(n/2)-1)*2 + k - n gives the same (beg, end)
split), so plain SAME is used here; only the stem conv is genuinely
VALID.  Module names mirror keras's block ids (``cell_{block_id}``) so
the ``.h5`` importer maps layers by name.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import KerasBatchNorm, avg_pool, dense, global_avg_pool, max_pool, upcast32


def _bn(dtype, name):
    return KerasBatchNorm(momentum=0.9997, epsilon=1e-3, dtype=dtype, name=name)


def _zeropad_same(x, window, stride):
    """Explicit zero padding with TF-SAME amounts (== keras correct_pad).

    Keras's reduction cells build ``h3 = ZeroPadding2D(correct_pad)(h)``
    and pool it with VALID — so the pools see ZEROS at the border (a max
    pool of an all-negative window returns 0 there, and the stride-2 avg
    pool divides by the full window-size including the pad cells).  A
    plain SAME pool differs: -inf max padding / pad-excluded averaging.
    """
    h, w = x.shape[1], x.shape[2]

    def pads(n):
        out = -(-n // stride)
        total = max((out - 1) * stride + window - n, 0)
        return total // 2, total - total // 2

    (t, b), (l, r) = pads(h), pads(w)
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class SepConvBlock(nn.Module):
    """NASNet separable-conv unit: (relu -> depthwise+pointwise -> BN) x 2,
    the stride applied in the first application (keras
    ``_separable_conv_block``)."""

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
    """Halves spatial dims of a skip input via two offset stride-2 1x1 convs
    (keras ``_adjust_block``'s reduction path: AvgPool(1,1,stride 2) + conv
    is exactly a stride-2 1x1 conv)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        p1 = nn.Conv(self.features // 2, (1, 1), strides=(2, 2),
                     use_bias=False, dtype=self.dtype, name="conv_1")(x)
        # pad bottom/right then drop the first row/col: keras's
        # ZeroPadding2D((0,1),(0,1)) + Cropping2D((1,0),(1,0)) shift
        shifted = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = nn.Conv(self.features - self.features // 2, (1, 1),
                     strides=(2, 2), use_bias=False, dtype=self.dtype,
                     name="conv_2")(shifted)
        out = jnp.concatenate([p1, p2], axis=-1)
        return _bn(self.dtype, "bn")(out, train)


class _Adjust(nn.Module):
    """Brings the previous-cell output to the shape the cell expects
    (keras ``_adjust_block``): factorized reduce on spatial mismatch,
    1x1 projection on channel mismatch, identity otherwise."""

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
    """NASNet-A normal cell (5 blocks, paper Fig. 4 left; keras
    ``_normal_a_cell`` wiring and concat order)."""

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
        h = _Squeeze(self.features, dtype=self.dtype, name="conv_1")(h, train)
        if p is None:
            p = h

        def sep(k, name):
            return SepConvBlock(self.features, k, dtype=self.dtype, name=name)

        x1 = sep(5, "left1")(h, train) + sep(3, "right1")(p, train)
        x2 = sep(5, "left2")(p, train) + sep(3, "right2")(p, train)
        x3 = avg_pool(h, 3, 1, padding="SAME", count_include_pad=False) + p
        x4 = avg_pool(p, 3, 1, padding="SAME",
                      count_include_pad=False) * 2.0
        x5 = sep(3, "left5")(h, train) + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1)


class ReductionCell(nn.Module):
    """NASNet-A reduction cell (5 blocks, paper Fig. 4 right; keras
    ``_reduction_a_cell`` wiring and concat order); stride 2."""

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
        h = _Squeeze(self.features, dtype=self.dtype, name="conv_1")(h, train)
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

        # keras pools h3 = ZeroPadding2D(correct_pad)(h) with VALID: max
        # pools see zeros (not -inf) and the stride-2 avg pool divides by
        # the full window incl. pad cells (== SAME avg with
        # count_include_pad=True); x4's stride-1 avg is a true 'same'
        # pooling layer (pad-excluded averaging).
        h3 = _zeropad_same(h, 3, 2)
        x1 = sep(5, "left1")(h, train) + sep(7, "right1")(p, train)
        x2 = max_pool(h3, 3, 2, padding="VALID") + sep(7, "right2")(p, train)
        x3 = avg_pool(h3, 3, 2, padding="VALID") + sep(5, "right3")(p, train)
        x4 = avg_pool(x1, 3, 1, padding="SAME",
                      count_include_pad=False) + x2
        # keras quirk: this sepconv's block_id is 'reduction_left4' too
        # (shared with the x4 avgpool, which carries no weights)
        x5 = sep(3, "left4", stride=1)(x1, train) + max_pool(
            h3, 3, 2, padding="VALID")
        return jnp.concatenate([x2, x3, x4, x5], axis=-1)


class NASNetA(nn.Module):
    """NASNet-A; defaults give the 'large' ImageNet model (~89M params).

    Cell modules are named ``cell_{block_id}`` after keras's block ids
    (``stem_1``, ``stem_2``, ``0``..``5``, ``reduce_6``, ``7``..``12``,
    ``reduce_12``, ``13``..``18`` for N=6), which the h5 importer keys on.
    """

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
        n = self.num_normal_cells

        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = _bn(self.dtype, "stem_bn")(x, train)

        # keras state machine: every cell returns (out, its x input); after
        # a reduction cell, skip_reduction=True KEEPS the old p (the output
        # of the second-to-last normal cell of the previous stage).
        p, cur = None, x
        for tag, f in (("stem_1", filters // 4), ("stem_2", filters // 2)):
            out = ReductionCell(f, dtype=self.dtype, name=f"cell_{tag}")(
                p, cur, train)
            p, cur = cur, out

        for stage in range(3):
            stage_filters = filters * (2 ** stage)
            if stage > 0:
                # skip_reduction: p is NOT advanced through the reduction
                out = ReductionCell(
                    stage_filters, dtype=self.dtype,
                    name=f"cell_reduce_{stage * n}",
                )(p, cur, train)
                cur = out
            for i in range(n):
                # keras block ids: 0..n-1, then n+i+1 and 2n+i+1 — i.e. one
                # id (n) is skipped after stage 0 only
                cell_id = stage * n + i + (1 if stage > 0 else 0)
                out = NormalCell(
                    stage_filters, dtype=self.dtype,
                    name=f"cell_{cell_id}",
                )(p, cur, train)
                p, cur = cur, out

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
