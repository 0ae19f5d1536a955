"""Exact chunked top-k: a faster lowering than XLA:TPU's sort-based top_k.

``jax.lax.top_k`` on wide rows lowers to a full variadic sort on TPU —
profiling the 50k-item retrieval protocol showed the (8192, 50000) sort
taking 87% of device time for k=251.  The exact two-stage reduction here
cuts the sorted width: per-chunk top-k first (sorting ``chunk``-wide rows),
then top-k of the ~N*k/chunk surviving candidates.

Tie-breaking matches ``lax.top_k`` exactly (smallest index wins among equal
values): within a chunk the inner top_k is index-stable; across chunks the
candidate list is ordered by chunk, so the outer top_k's positional
tie-break again selects the smaller global index.  Verified against
``lax.top_k`` on adversarial tie patterns in tests/test_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def exact_topk(x, k, chunk=2048):
    """Values and indices of the top ``k`` of each row of ``x`` (2-D),
    exactly equal to ``lax.top_k(x, k)`` including tie order.

    ``chunk`` is the inner reduction width; must be >= k. Rows are padded
    with -inf up to a chunk multiple (padding can never be selected while
    k <= N).
    """
    b, n = x.shape
    if k > n:
        raise ValueError(f"k={k} > row length {n}")
    chunk = max(int(chunk), int(k))
    if n <= chunk:
        return lax.top_k(x, k)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        fill = jnp.full((b, pad), -jnp.inf, dtype=x.dtype)
        x = jnp.concatenate([x, fill], axis=1)
    xc = x.reshape(b, n_chunks, chunk)
    v, i = lax.top_k(xc, k)  # (b, n_chunks, k), index-stable per chunk
    base = (jnp.arange(n_chunks, dtype=i.dtype) * chunk)[None, :, None]
    cand_v = v.reshape(b, n_chunks * k)
    cand_i = (i + base).reshape(b, n_chunks * k)
    v2, j = lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, j, axis=1)
    return v2, idx


def exact_topk_payload(x, payload, k, chunk=2048):
    """Top-``k`` values of each row of ``x`` with an arbitrary int payload
    gathered along (e.g. database class ids), tie order as ``lax.top_k``.

    Equivalent to ``v, i = lax.top_k(x, k); payload[i]`` but without
    materializing (or sorting) row-wide index tensors.
    """
    v, idx = exact_topk(x, k, chunk=chunk)
    return v, payload[idx]
