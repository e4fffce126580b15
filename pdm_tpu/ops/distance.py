"""Pairwise squared-distance primitives (Gram-matrix expansion).

``||x - y||^2 = ||x||^2 - 2 x.y + ||y||^2`` — one MXU GEMM plus rank-1
corrections; XLA fuses the additions into the matmul epilogue.

Capability parity: reference ``utils/distance.py:5-21`` (the hot primitive
under the true-posterior model and all stats estimators). The streaming,
never-materialize-(B x N) path lives in ``ops/boltzmann.py``; this module is
the explicit-matrix variant for small problems and for tests.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _flatten(x: Array) -> Array:
    return x.reshape(x.shape[0], -1)


def norm_sqr(x: Array) -> Array:
    """Per-row squared norm of a flattened batch."""
    x = _flatten(x)
    return jnp.sum(x * x, axis=-1)


def compute_gram_matrix(x: Array, y: Array) -> Array:
    return jnp.dot(_flatten(x), _flatten(y).T, preferred_element_type=jnp.float32)


def compute_pw_dist_sqr(x: Array, y: Array | None = None) -> Array:
    """(B, N) matrix of squared distances between rows of x and y.

    Inputs of any object shape; flattened over non-batch dims. Accumulates
    in float32 regardless of input dtype (bf16-safe).
    """
    xf = _flatten(x).astype(jnp.float32)
    yf = xf if y is None else _flatten(y).astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=-1)
    y_sq = jnp.sum(yf * yf, axis=-1)
    gram = jnp.dot(xf, yf.T, preferred_element_type=jnp.float32)
    return x_sq[:, None] - 2.0 * gram + y_sq[None, :]
