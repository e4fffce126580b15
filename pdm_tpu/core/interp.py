"""Monotone piecewise-linear interpolation with linear edge extrapolation.

Used by the knot-based (interpolated) schedulers to realize both directions
of the ``tau <-> log_temp`` map from a tabulated, monotone set of knots.

Unlike ``jnp.interp`` (which clamps at the boundary), queries outside the
knot range are extrapolated linearly along the edge segment — matching the
semantics the reference relies on (``utils/utils.py:169-181``: searchsorted
index clamped to [1, n-1], weights left unbounded).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def interp1d(x_knots: Array, y_knots: Array, x: Array) -> Array:
    """Piecewise-linear interpolation of monotone-increasing ``x_knots``.

    Linear extrapolation beyond both ends. Pure jnp; traces under jit and
    differentiates w.r.t. all three arguments.
    """
    x_knots = jnp.asarray(x_knots)
    y_knots = jnp.asarray(y_knots)
    xq = jnp.asarray(x)

    idx = jnp.clip(jnp.searchsorted(x_knots, xq, side="left"), 1, x_knots.shape[0] - 1)
    xl = x_knots[idx - 1]
    xr = x_knots[idx]
    yl = y_knots[idx - 1]
    yr = y_knots[idx]

    denom = xr - xl
    wl = jnp.where(denom == 0, 0.5, (xr - xq) / jnp.where(denom == 0, 1.0, denom))
    return wl * yl + (1.0 - wl) * yr


def interp1d_descending(x_knots: Array, y_knots: Array, x: Array) -> Array:
    """interp1d for monotone-decreasing x_knots (negate to make increasing)."""
    return interp1d(-x_knots, y_knots, -jnp.asarray(x))
