"""Temperature algebra: the change of variables at the heart of the framework.

The variance-preserving (VP) diffusion forward process

    x_t = sqrt(alpha_bar) * x0 + sqrt(1 - alpha_bar) * eps

is reparametrized by a *temperature* ``T = (1 - alpha_bar) / alpha_bar``.
All schedules, estimators and samplers in this framework operate in
``log_temp = log T`` space, which is the natural thermodynamic coordinate:
``alpha_bar = sigmoid(-log_temp)``.

Capability parity: reference ``diffusion/scheduler/scheduler.py:13-22``
(re-derived here for JAX; everything is a pure function on jnp arrays so it
traces under ``jax.jit`` and differentiates under ``jax.grad``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def log_temp_from_alpha_bar(alpha_bar: Array) -> Array:
    """log T = log(1 - alpha_bar) - log(alpha_bar)  (= logit(1 - alpha_bar))."""
    return jnp.log1p(-alpha_bar) - jnp.log(alpha_bar)


def alpha_bar_from_log_temp(log_temp: Array) -> Array:
    """alpha_bar = 1 / (1 + T) = sigmoid(-log T)."""
    return jax.nn.sigmoid(-log_temp)


def one_minus_alpha_bar_from_log_temp(log_temp: Array) -> Array:
    """1 - alpha_bar = T / (1 + T) = sigmoid(log T), computed stably."""
    return jax.nn.sigmoid(log_temp)


def temp_from_log_temp(log_temp: Array) -> Array:
    return jnp.exp(log_temp)


def log_temp_from_temp(temp: Array) -> Array:
    return jnp.log(temp)


def bcast_right(x: Array, target_ndim: int) -> Array:
    """Reshape a per-sample vector (B,) to (B, 1, ..., 1) for broadcasting
    against a batch of objects with ``target_ndim`` dims.

    Parity with reference ``cast_log_temp`` (scheduler.py:21-22).
    """
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x
    return x.reshape(x.shape[0], *([1] * (target_ndim - 1)))
