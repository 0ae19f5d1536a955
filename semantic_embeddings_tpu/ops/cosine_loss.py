"""Fused L2-normalize + dot cosine loss as a Pallas TPU kernel.

The reference computes the cosine loss as a Keras Lambda l2-normalization
layer followed by ``1 - sum(y_true * y_pred)`` (``/root/reference/utils.py:
44-46,125-127``).  Here forward and backward are each ONE Pallas kernel over
batch tiles resident in VMEM:

  forward:  n_i = max(||z_i||^2, eps); loss_i = 1 - (t_i . z_i) * rsqrt(n_i)
  backward: dz_i = -g_i * rsqrt(n_i) * (t_i - ((t_i . z_i) / n_i) * z_i)

avoiding HBM round-trips for the normalized intermediate.  Per-row scalars
travel as (B, 1) arrays (Mosaic's 1-D f32 layout tiling differs from XLA's);
the backward recomputes the two row reductions from the VMEM-resident tiles
instead of carrying residuals.  A jnp fallback with identical semantics is
used off-TPU; both paths share one ``custom_vjp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12  # tf.nn.l2_normalize epsilon
_TILE = 256


def _use_pallas(x):
    return (
        jax.default_backend() not in ("cpu",)
        and x.ndim == 2
        and x.shape[1] >= 8
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(z_ref, t_ref, loss_ref):
    z = z_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    nsq = jnp.maximum(jnp.sum(z * z, axis=1, keepdims=True), _EPS)
    dot = jnp.sum(t * z, axis=1, keepdims=True)
    loss_ref[:] = 1.0 - dot * jax.lax.rsqrt(nsq)


def _bwd_kernel(z_ref, t_ref, g_ref, dz_ref):
    z = z_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    g = g_ref[:]
    nsq = jnp.maximum(jnp.sum(z * z, axis=1, keepdims=True), _EPS)
    dot = jnp.sum(t * z, axis=1, keepdims=True)
    coeff = -g * jax.lax.rsqrt(nsq)
    dz_ref[:] = (coeff * (t - (dot / nsq) * z)).astype(dz_ref.dtype)


def _pallas_forward(z, t):
    from jax.experimental import pallas as pl

    b, d = z.shape
    grid = (pl.cdiv(b, _TILE),)
    row_spec = pl.BlockSpec((_TILE, d), lambda i: (i, 0))
    col_spec = pl.BlockSpec((_TILE, 1), lambda i: (i, 0))
    loss = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec],
        out_specs=col_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
    )(z, t)
    return loss[:, 0]


def _pallas_backward(z, t, g):
    from jax.experimental import pallas as pl

    b, d = z.shape
    grid = (pl.cdiv(b, _TILE),)
    row_spec = pl.BlockSpec((_TILE, d), lambda i: (i, 0))
    col_spec = pl.BlockSpec((_TILE, 1), lambda i: (i, 0))
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, col_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), z.dtype),
    )(z, t, g.reshape(b, 1).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_cosine_loss(z, t):
    """Per-sample ``1 - <t, z/||z||>`` with a fused backward.

    ``z``: raw (un-normalized) embeddings (B, D); ``t``: target class
    embeddings (B, D), treated as constants (no gradient).
    """
    if _use_pallas(z):
        return _pallas_forward(z, t)
    return _jnp_forward(z, t)


def _jnp_forward(z, t):
    zf = z.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    nsq = jnp.maximum(jnp.sum(zf * zf, axis=1), _EPS)
    dot = jnp.sum(tf * zf, axis=1)
    return 1.0 - dot * jax.lax.rsqrt(nsq)


def _fwd(z, t):
    return fused_cosine_loss(z, t), (z, t)


def _bwd(residuals, g):
    z, t = residuals
    if _use_pallas(z):
        return _pallas_backward(z, t, g), None
    zf = z.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    nsq = jnp.maximum(jnp.sum(zf * zf, axis=1), _EPS)
    dot = jnp.sum(tf * zf, axis=1)
    inv_n = jax.lax.rsqrt(nsq)
    dz = ((-g * inv_n)[:, None] * (tf - (dot / nsq)[:, None] * zf)).astype(
        z.dtype
    )
    return dz, None


fused_cosine_loss.defvjp(_fwd, _bwd)


def l2_normalize(x, epsilon=_EPS):
    """Plain normalized output (inference/feature path)."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, epsilon))
