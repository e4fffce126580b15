"""Closed-form noise schedules in log-temperature space.

All three are exact-inverse pairs ``tau <-> log T``:

* ``LinearBetaScheduler`` — continuum limit of the DDPM linearly spaced
  betas (derivation in the reference's formulas.md "Analytical
  approximation"): ``1 + T = scale * exp(gamma * tau^2)`` with
  ``scale = 1 + T_min`` and ``gamma = log((1 + T_max) / scale)``.
* ``CosineScheduler`` — ``sqrt(T) = tan(pi/2 * tau)`` rescaled so the
  endpoints hit (T_min, T_max).
* ``LogSNRScheduler`` — log T linear in tau (linear log-SNR).

Capability parity: reference ``diffusion/scheduler/{linear,cosine,log_snr}.py``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import Array

from .base import Scheduler


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearBetaScheduler(Scheduler):
    min_temp: float = dataclasses.field(metadata=dict(static=True))
    max_temp: float = dataclasses.field(metadata=dict(static=True))

    @property
    def _scale(self) -> float:
        return 1.0 + self.min_temp

    @property
    def _gamma(self) -> float:
        return math.log((1.0 + self.max_temp) / self._scale)

    def log_temp_from_tau(self, tau: Array) -> Array:
        # T = scale * exp(gamma * tau^2) - 1; use expm1/log1p around tau=0
        # for accuracy at low temperature.
        g = jnp.square(tau) * self._gamma + math.log(self._scale)
        return jnp.log(jnp.expm1(g))

    def tau_from_log_temp(self, log_temp: Array) -> Array:
        # tau = sqrt(log((T + 1) / scale) / gamma)
        g = jnp.logaddexp(log_temp, 0.0)  # log(T + 1), stable for large |logT|
        return jnp.sqrt(jnp.maximum(g - math.log(self._scale), 0.0) / self._gamma)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CosineScheduler(Scheduler):
    min_temp: float = dataclasses.field(metadata=dict(static=True))
    max_temp: float = dataclasses.field(metadata=dict(static=True))

    @property
    def _shift(self) -> float:
        return math.atan(math.sqrt(self.min_temp))

    @property
    def _scale(self) -> float:
        return math.atan(math.sqrt(self.max_temp)) - self._shift

    def log_temp_from_tau(self, tau: Array) -> Array:
        return 2.0 * jnp.log(jnp.tan(tau * self._scale + self._shift))

    def tau_from_log_temp(self, log_temp: Array) -> Array:
        return (jnp.arctan(jnp.exp(0.5 * log_temp)) - self._shift) / self._scale


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogSNRScheduler(Scheduler):
    min_temp: float = dataclasses.field(metadata=dict(static=True))
    max_temp: float = dataclasses.field(metadata=dict(static=True))

    @property
    def min_log_temp(self) -> float:
        return math.log(self.min_temp)

    @property
    def max_log_temp(self) -> float:
        return math.log(self.max_temp)

    def log_temp_from_tau(self, tau: Array) -> Array:
        return self.min_log_temp * (1.0 - tau) + self.max_log_temp * tau

    def tau_from_log_temp(self, log_temp: Array) -> Array:
        return (log_temp - self.min_log_temp) / (self.max_log_temp - self.min_log_temp)
