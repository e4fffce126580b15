"""Maximum Mean Discrepancy with RBF kernels — jit-compiled evaluation
metric (and differentiable loss for schedule optimization).

Capability parity: reference ``scripts/sample_gmm.py:compute_mmd`` (single
scale) and ``scripts/optimize_schedule.py:compute_mmd`` (multi-scale).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import Array

from .distance import compute_pw_dist_sqr


@partial(jax.jit, static_argnames=("sigmas",))
def mmd_rbf(x: Array, y: Array, sigmas: Sequence[float] = (1.0,)) -> Array:
    """Biased MMD^2 estimate averaged over RBF bandwidths."""
    d_xx = compute_pw_dist_sqr(x)
    d_yy = compute_pw_dist_sqr(y)
    d_xy = compute_pw_dist_sqr(x, y)

    total = 0.0
    for s in sigmas:
        gamma = 1.0 / (2.0 * s * s + 1e-8)
        total = total + (
            jnp.exp(-d_xx * gamma).mean()
            + jnp.exp(-d_yy * gamma).mean()
            - 2.0 * jnp.exp(-d_xy * gamma).mean()
        )
    return total / len(sigmas)
