"""Pallas fused 3x3 conv forward + BatchNorm statistics (cross-op fusion).

VERDICT r1 #2: the remaining single-chip lever identified in SPEED.md is
overlapping the HBM-bound BN statistic reductions with the MXU-bound convs.
XLA already fuses BN reduces into conv epilogues at 32 px (SPEED.md's
lane-bound cross-check bounds any further fusion there at <= 1.15x); this
kernel targets the 224 px ResNet-50 shapes instead, where channel counts
(64-512) fill the MXU lanes — unlike the C=32 CIFAR case where a Pallas
conv measured 13x slower than XLA's fusion.

One pass: the conv output tile is produced on the MXU (nine shifted-window
dots per image, both operands VMEM-resident) and the per-channel sum /
sum-of-squares that BatchNorm needs are reduced from the accumulator
before it ever leaves VMEM — the separate stats pass over the conv output
(a full HBM read at the reduce roofline) disappears.

Numerics: accumulation f32; the emitted y is bf16 (matching the XLA path),
and the statistics are computed from the bf16-rounded y so they equal the
unfused conv -> convert -> reduce chain bit-for-bit-ish (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, y_ref, s_ref, ss_ref, *, BT, H, W, C, F,
            out_dtype):
    # 3-D dot per tap: slicing (kh, kw) moves only sublane groups (C stays
    # in lanes) and contracting over the last axis needs NO reshape — the
    # (H, W) -> H*W repack of the first formulation measured 15-30x slower
    # than XLA's conv on v5e (strided sublane copies per tap).  BT images
    # per grid step feed the MXU a larger effective M.
    acc = jnp.zeros((BT, H, W, F), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            window = x_ref[:, kh:kh + H, kw:kw + W, :]
            acc = acc + jax.lax.dot_general(
                window, w_ref[kh, kw],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = acc.astype(out_dtype)
    y_ref[:] = y
    # statistics of the ROUNDED output: equals the unfused
    # conv -> convert(f32) -> reduce chain
    yf = y.astype(jnp.float32)
    s_ref[0, 0] = jnp.sum(yf, axis=(0, 1, 2))
    ss_ref[0, 0] = jnp.sum(yf * yf, axis=(0, 1, 2))


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def conv3x3_bn_stats(x, w, interpret=False, batch_tile=1):
    """3x3 SAME stride-1 conv (NHWC x HWIO) returning
    ``(y, channel_sum, channel_sumsq)`` in one device pass.

    ``y`` matches ``lax.conv_general_dilated`` in ``x.dtype``; the stats
    are f32 sums over (B, H, W) of ``y`` and ``y**2`` — exactly what BN's
    mean / variance need (``mean = sum/n``, ``var = sumsq/n - mean**2``).
    """
    B, H, W, C = x.shape
    kh, kw, wc, F = w.shape
    assert (kh, kw, wc) == (3, 3, C), (w.shape, x.shape)
    bt = max(1, min(int(batch_tile), B))
    while B % bt:
        bt -= 1
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nb = B // bt
    y, s, ss = pl.pallas_call(
        functools.partial(
            _kernel, BT=bt, H=H, W=W, C=C, F=F, out_dtype=x.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, H + 2, W + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, F), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, H, W, F), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (nb, 1, F) so the trailing two block dims equal the array
            # dims (Mosaic tiling constraint for non-multiple-of-128 F)
            pl.BlockSpec((1, 1, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, F), x.dtype),
            jax.ShapeDtypeStruct((nb, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, F), jnp.float32),
        ],
        interpret=interpret,
    )(x_pad, w)
    return y, s.sum(axis=(0, 1)), ss.sum(axis=(0, 1))


def conv3x3_bn_stats_reference(x, w):
    """Unfused baseline: XLA conv, then stats over the rounded output."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, yf.sum(axis=(0, 1, 2)), (yf * yf).sum(axis=(0, 1, 2))
