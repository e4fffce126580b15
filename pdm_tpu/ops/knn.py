"""Chunked k-nearest-neighbor distances on device.

Replaces the reference's sklearn NearestNeighbors host round-trip
(utils/stats.py:42-63) with a tiled on-device computation: stream row
chunks of the (N, N) squared-distance matrix (one MXU GEMM per chunk) and
take a top-k per row. Never materializes N x N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


@partial(jax.jit, static_argnames=("k", "chunk_size", "mxu_precision"))
def knn_sqdist(
    data: Array,
    k: int = 5,
    chunk_size: int = 1024,
    mxu_precision: str = "fp32",
) -> Array:
    """(N,) squared distance to each point's k-th nearest neighbor
    (excluding the point itself). ``mxu_precision``: the unified Gram
    policy (ops/precision.py); fp32 by default — see the comment below."""
    from .precision import xla_dot_precision

    dot_prec = xla_dot_precision(mxu_precision)
    x = data.reshape(data.shape[0], -1).astype(jnp.float32)
    n, d = x.shape
    chunk = min(chunk_size, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    x_sq = jnp.sum(x * x, axis=-1)
    xp_sq = jnp.sum(xp * xp, axis=-1)

    def body(ci):
        rows = jax.lax.dynamic_slice_in_dim(xp, ci * chunk, chunk)
        rows_sq = jax.lax.dynamic_slice_in_dim(xp_sq, ci * chunk, chunk)
        # HIGHEST precision: the rows_sq - 2 gram + x_sq expansion is
        # cancellation-prone, and a default bf16 Gram at CIFAR scale
        # (||x||^2 ~ 3e3) carries O(10) absolute error — enough to flip
        # neighbor order (reference k-NN is exact sklearn)
        gram = jnp.dot(
            rows, x.T, preferred_element_type=jnp.float32,
            precision=dot_prec,
        )
        dist = rows_sq[:, None] - 2.0 * gram + x_sq[None, :]
        # exclude self-distance: mask the diagonal entries
        col = jnp.arange(n)[None, :]
        row_global = ci * chunk + jnp.arange(chunk)[:, None]
        dist = jnp.where(col == row_global, jnp.inf, dist)
        # k-th smallest = top_k of negated distances
        neg_top, _ = jax.lax.top_k(-dist, k)
        return -neg_top[:, k - 1]

    out = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, chunk)
    return jnp.maximum(out.reshape(-1)[:n], 0.0)
