"""DDPM model abstraction.

A model is an immutable pytree dataclass bundling a scheduler, a
parametrization tag, and whatever state its ``forward`` needs (flax params,
a buffered dataset, ...). Methods are pure — models pass through jit/scan
boundaries as arguments — the TPU-idiomatic replacement for the
reference's stateful ``nn.Module`` objects.

Capability parity: reference ``diffusion/ddpm/ddpm.py:31-45`` (DDPM ABC).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array

from ..core.temperature import alpha_bar_from_log_temp
from ..schedulers.base import Scheduler
from .predictions import Predictions, convert_prediction


class DDPM:
    """Base: subclasses define ``forward(xt, tau) -> pred`` as a pure fn."""

    scheduler: Scheduler
    parametrization: str

    def forward(self, xt: Array, tau: Array) -> Array:
        raise NotImplementedError

    def __call__(self, xt: Array, tau: Array) -> Array:
        return self.forward(xt, tau)

    def get_predictions(self, xt: Array, log_temp: Array) -> Predictions:
        """log_temp -> tau -> alpha_bar -> forward -> full parametrization
        triple. Parity: reference ddpm.py:38-41."""
        tau = jnp.clip(self.scheduler.tau_from_log_temp(log_temp), 0.0, 1.0)
        alpha_bar = alpha_bar_from_log_temp(self.scheduler.log_temp_from_tau(tau))
        pred = self.forward(xt, tau)
        return convert_prediction(pred, xt, alpha_bar, self.parametrization)

    @property
    def max_log_temp(self) -> float:
        return float(self.scheduler.log_temp_from_tau(jnp.ones(())))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrueDDPM(DDPM):
    """Bayes-optimal analytic denoiser: forward = exact posterior mean
    E[x0 | xt] over a device-resident training set.

    Parity: reference diffusion/ddpm/true_model.py (DDPMTrue); the compute
    runs through the fused streaming Boltzmann op instead of a
    materialized distance matrix.
    """

    scheduler: Scheduler
    train_data: Array
    parametrization: str = dataclasses.field(
        default="x0", metadata=dict(static=True)
    )

    def forward(self, xt: Array, tau: Array) -> Array:
        from ..ops.boltzmann import true_posterior_mean_x0

        tau = jnp.broadcast_to(jnp.asarray(tau), (xt.shape[0],))
        log_temp = self.scheduler.log_temp_from_tau(tau)
        return true_posterior_mean_x0(xt, log_temp, self.train_data)
