"""Pallas kernel: 3x3 SAME stride-1 convolution filter gradient.

Profiling the 32px CIFAR train step shows XLA lowering conv weight
gradients to VPU ``multiply_reduce`` fusions running ~2.7x off the HBM
roofline (ROUND_NOTES.md).  This kernel computes

    dW[kh, kw, ci, co] = sum_{n,h,w} x_pad[n, h+kh, w+kw, ci] * dy[n, h, w, co]

as nine MXU contractions per batch tile, with both operands VMEM-resident
and the (3, 3, Ci, Co) output accumulated across the sequential grid — one
read of x and dy total.  Standalone prototype (not yet wired into the conv
layers); see the jnp reference implementation below and the parity test.

Measured on TPU v5e at (256, 32, 32, 32) bf16 (the CIFAR stage-2 shape):
this kernel 1503us, XLA's dedicated conv-backprop-filter custom call
1056us, HBM roofline ~40us.  Both are MXU-shape-bound (32x32 outputs on a
128x128 systolic array); an im2col single-dot variant (M=288) measured
1698us — the 9x VMEM concat copies cost more than the MXU utilisation
gain.  Conclusion recorded in ROUND_NOTES.md: XLA's dedicated kernel
already beats this standalone, so the in-step filter-grad gap seen in
profiling stems from XLA *fusing* the grad into VPU multiply_reduce
instead of calling its conv kernel; the round-2 lever is whole-block
backward fusion, not this op in isolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3x3_filter_grad_reference(x, dy):
    """Reference implementation via jax's own conv gradient (XLA's
    conv-backprop-filter lowering), computed in the input dtype like the
    training backward would."""
    xd = x
    dyd = dy.astype(x.dtype)

    def conv(w):
        return jax.lax.conv_general_dilated(
            xd, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ci, co = x.shape[-1], dy.shape[-1]
    _, vjp = jax.vjp(conv, jnp.zeros((3, 3, ci, co), x.dtype))
    return vjp(dyd)[0].astype(jnp.float32)


def _kernel(x_ref, dy_ref, out_ref):
    from jax.experimental import pallas as pl

    tb, hp, wp, ci = x_ref.shape
    _, h, w, co = dy_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Keep operands in their storage dtype (bf16) — the MXU accumulates
    # in f32 natively via preferred_element_type, so no f32 copies of the
    # activations are materialized in VMEM.
    dy = dy_ref[...].reshape(tb * h * w, co)
    for kh in range(3):
        for kw in range(3):
            xs = x_ref[:, kh : kh + h, kw : kw + w, :].reshape(tb * h * w, ci)
            acc = jax.lax.dot_general(
                xs, dy,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[kh, kw] += acc


def conv3x3_filter_grad(x, dy, batch_tile=16, interpret=False):
    """dW for a 3x3 SAME stride-1 conv, (N,H,W,Ci) x (N,H,W,Co) -> f32.

    ``N`` must be divisible by ``batch_tile``.  ``interpret=True`` runs the
    Pallas interpreter (for CPU-backed tests).
    """
    from jax.experimental import pallas as pl

    n, h, w, ci = x.shape
    co = dy.shape[-1]
    if n % batch_tile:
        raise ValueError(f"batch {n} not divisible by tile {batch_tile}")
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = (n // batch_tile,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((batch_tile, h + 2, w + 2, ci), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((batch_tile, h, w, co), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
    )(x_pad, dy)
