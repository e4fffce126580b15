"""Noise-schedule abstraction.

A scheduler is an invertible monotone map between the scaled time
``tau in [0, 1]`` and the thermodynamic coordinate ``log_temp = log T``.
Everything else (alpha_bar, the VP forward process, sampling grids) derives
from that pair of functions.

TPU-first design: schedulers are immutable pytree dataclasses whose methods
are pure jnp functions — they can be passed straight through ``jax.jit``
boundaries, vmapped, and differentiated (the knot arrays of interpolated
schedulers are pytree *leaves*, which is what makes the differentiable
schedule optimizer in ``diffusion/schedule_opt.py`` work for free).

Capability parity: reference ``diffusion/scheduler/scheduler.py:25-69``.
The analytic-score / posterior-mean helpers that the reference attaches to
its Scheduler class live in ``pdm_tpu/ops/boltzmann.py`` here (they are
dataset-level compute kernels, not schedule math); thin wrappers below keep
the reference's call surface.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core.temperature import (
    alpha_bar_from_log_temp,
    bcast_right,
    one_minus_alpha_bar_from_log_temp,
)


class Scheduler:
    """Base class. Subclasses implement the tau <-> log_temp bijection."""

    def log_temp_from_tau(self, tau: Array) -> Array:
        raise NotImplementedError

    def tau_from_log_temp(self, log_temp: Array) -> Array:
        raise NotImplementedError

    # -- derived quantities -------------------------------------------------

    def alpha_bar_from_tau(self, tau: Array) -> Array:
        return alpha_bar_from_log_temp(self.log_temp_from_tau(tau))

    def add_noise(
        self,
        key: jax.Array,
        x0: Array,
        tau: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        """VP forward process with uniform-tau sampling.

        Returns (tau, eps, xt) with xt = sqrt(ab) x0 + sqrt(1-ab) eps.
        Parity: reference scheduler.py:40-45 (uniform tau per sample).
        """
        key_tau, key_eps = jax.random.split(key)
        if tau is None:
            tau = jax.random.uniform(key_tau, (x0.shape[0],), dtype=x0.dtype)
        log_temp = self.log_temp_from_tau(tau)
        ab = bcast_right(alpha_bar_from_log_temp(log_temp), x0.ndim)
        omab = bcast_right(one_minus_alpha_bar_from_log_temp(log_temp), x0.ndim)
        eps = jax.random.normal(key_eps, x0.shape, dtype=x0.dtype)
        xt = jnp.sqrt(ab) * x0 + jnp.sqrt(omab) * eps
        return tau, eps, xt

    # -- analytic (dataset-exact) quantities ---------------------------------
    # Thin parity wrappers over the fused Boltzmann ops (see ops/boltzmann.py).

    def true_posterior_mean_x0(self, xt: Array, tau: Array, data: Array) -> Array:
        """Bayes-optimal E[x0 | xt] over a finite dataset.

        Parity: reference scheduler.py:58-69 (fp32 softmax over pairwise
        distances). Here it is a single fused streaming op.
        """
        from ..ops.boltzmann import true_posterior_mean_x0

        log_temp = self.log_temp_from_tau(tau)
        return true_posterior_mean_x0(xt, log_temp, data)

    def true_score(self, xt: Array, tau: Array, data: Array) -> Array:
        """Analytic marginal score over a finite dataset.

        Parity: reference scheduler.py:47-56. Delegates to the fused op
        (ops/boltzmann.true_score) — one implementation of the algebra.
        """
        from ..ops.boltzmann import true_score

        return true_score(xt, self.log_temp_from_tau(tau), data)


def register_scheduler_pytree(cls, data_fields: tuple, meta_fields: tuple = ()):
    """Register a scheduler dataclass as a JAX pytree."""
    dataclasses.dataclass(frozen=True)(cls)
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls
