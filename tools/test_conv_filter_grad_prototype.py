"""Pallas 3x3 conv filter-grad prototype: parity vs jax's own conv VJP
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from conv_filter_grad_prototype import (
    conv3x3_filter_grad,
    conv3x3_filter_grad_reference,
)


def test_filter_grad_matches_conv_vjp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(8, 8, 8, 6)).astype(np.float32))
    ref = conv3x3_filter_grad_reference(x, dy)
    got = conv3x3_filter_grad(x, dy, batch_tile=4, interpret=True)
    assert got.shape == (3, 3, 4, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_filter_grad_rejects_bad_tile():
    x = jnp.zeros((6, 4, 4, 2))
    dy = jnp.zeros((6, 4, 4, 2))
    try:
        conv3x3_filter_grad(x, dy, batch_tile=4, interpret=True)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")
