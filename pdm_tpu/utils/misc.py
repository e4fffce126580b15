"""Small numeric utilities kept for API parity with the reference's
utils/utils.py: per-sample Jacobians and trapezoid CDFs."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def batch_jacobian(func: Callable[[Array], Array], x: Array) -> Array:
    """(B, out_dim, in_dim) Jacobian of a batched function — vmapped
    forward-mode instead of the reference's sum-trick over autograd
    (utils/utils.py:44-49)."""
    return jax.vmap(jax.jacfwd(lambda xi: func(xi[None])[0]))(x)


def compute_cdf(x: np.ndarray, non_normalized_p: np.ndarray) -> np.ndarray:
    """Normalized CDF of a tabulated density via the reference's trapezoid
    construction (utils/utils.py:184-186)."""
    steps = 0.5 * (non_normalized_p[1:] + non_normalized_p[:-1]) / (x[1:] - x[:-1])
    cdf = np.cumsum(np.concatenate([[0.0], steps]))
    return cdf / cdf[-1]
