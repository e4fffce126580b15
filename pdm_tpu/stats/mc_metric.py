"""Monte-Carlo estimators of the Fisher-Rao metric over noise levels,
via the identity  G = I_noise - Var_y[marginal score]  (reference
derivation.tex "Monte Carlo Estimation").

Three parameterizations, matching the reference's utils/metric_utils.py:

* ``metric_scalar``           — isotropic Sigma = sigma^2 I, natural
  parameter lambda = log sigma^2. Marginal score of a y-sample is
  E_posterior[-D/2 + ||y-x||^2 / (2 sigma^2)] — i.e. ``-D/2 + E_p[g]``
  where g is exactly the Boltzmann op's energy/T: the estimator is one
  streaming pass, no (n_y, K) matrix.
* ``metric_matrix_diag``      — diagonal Lambda, per-dim scores
  ``-1/2 + (y_d-x_d)^2 / (2 Sigma_dd)``. The per-dim posterior moments
  ride the op's ``values`` channel (E_p[y], E_p[y^2]).
* ``rescaled_metric_diag``    — parameterization theta = Sigma with the
  reference's empirical rescaling factor 4 Sigma^2 / (Sigma0 + 2 Sigma).

All estimators are jit-compiled end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.boltzmann import boltzmann_moments_xla


def _sample_y_iso(key, x_samples: Array, sigma: Array, n_y: int) -> Array:
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n_y,), 0, x_samples.shape[0])
    eps = jax.random.normal(k2, (n_y, x_samples.shape[1]))
    return x_samples[idx] + sigma * eps


@partial(jax.jit, static_argnames=("n_y",))
def metric_scalar(
    log_sigma_sq: Array, x_samples: Array, key: jax.Array, n_y: int = 10_000
) -> Array:
    """G(lambda) for lambda = log sigma^2, isotropic noise.

    G = D/2 - Var_y[ -D/2 + E_p[||y-x||^2 / (2 sigma^2)] ]
      = D/2 - Var_y[ E_p[g] ]  with the op's g = H / sigma^2.
    Parity: reference metric_utils.compute_metric_scalar.
    """
    x = x_samples.astype(jnp.float32)
    K, D = x.shape
    sigma_sq = jnp.exp(log_sigma_sq)
    y = _sample_y_iso(key, x, jnp.sqrt(sigma_sq), n_y)
    mom = boltzmann_moments_xla(y, x, inv_temp=1.0 / sigma_sq)
    marginal_scores = mom.e1  # -D/2 shift drops out of the variance
    return 0.5 * D - jnp.var(marginal_scores, ddof=1)


def _posterior_dim_moments(
    y: Array, x: Array, sigma_diag: Array
) -> Tuple[Array, Array]:
    """E_p[x_d] and E_p[x_d^2] under the anisotropic Boltzmann posterior
    p propto exp(-0.5 sum_d (y_d - x_d)^2 / Sigma_dd), via coordinate
    whitening (energy = 0.5||y' - x'||^2 with v' = v / sqrt(Sigma))."""
    inv_s = 1.0 / jnp.sqrt(sigma_diag)
    vals = jnp.concatenate([x, jnp.square(x)], axis=1)  # (K, 2D)
    mom = boltzmann_moments_xla(
        y * inv_s[None, :], x * inv_s[None, :], inv_temp=1.0, values=vals
    )
    D = x.shape[1]
    return mom.mean[:, :D], mom.mean[:, D:]


def _e_sq_diff(y: Array, ex: Array, ex2: Array) -> Array:
    """E_p[(y_d - x_d)^2] = y_d^2 - 2 y_d E[x_d] + E[x_d^2]."""
    return jnp.square(y) - 2.0 * y * ex + ex2


@partial(jax.jit, static_argnames=("n_y",))
def metric_matrix_diag(
    lambda_diag: Array, x_samples: Array, key: jax.Array, n_y: int = 10_000
) -> Array:
    """Diagonal G(Lambda) for Sigma = diag(exp(lambda_d)).

    Per-dim marginal score s_d = -1/2 + E_p[(y_d-x_d)^2] / (2 Sigma_dd);
    G_dd = 1/2 - Var_y[s_d]. Parity: metric_utils.compute_metric_matrix
    (diagonal case).
    """
    x = x_samples.astype(jnp.float32)
    K, D = x.shape
    sigma_diag = jnp.exp(lambda_diag)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n_y,), 0, K)
    eps = jax.random.normal(k2, (n_y, D))
    y = x[idx] + jnp.sqrt(sigma_diag)[None, :] * eps

    ex, ex2 = _posterior_dim_moments(y, x, sigma_diag)
    scores = -0.5 + 0.5 * _e_sq_diff(y, ex, ex2) / sigma_diag[None, :]
    return 0.5 - jnp.var(scores, axis=0, ddof=1)


@partial(jax.jit, static_argnames=("n_y",))
def rescaled_metric_diag(
    sigma_diag: Array, x_samples: Array, key: jax.Array, n_y: int = 10_000
) -> Array:
    """Rescaled metric G_tilde for theta = Sigma (diagonal).

    s_d = -1/(2 Sigma_dd) + E_p[(y_d-x_d)^2] / (2 Sigma_dd^2);
    G_dd = 1/(2 Sigma_dd^2) - Var_y[s_d], then the empirical factor
    4 Sigma^2 / (Sigma0 + 2 Sigma). Parity:
    metric_utils.compute_rescaled_metric_matrix.
    """
    x = x_samples.astype(jnp.float32)
    K, D = x.shape
    sigma_diag = jnp.broadcast_to(jnp.asarray(sigma_diag, jnp.float32), (D,))
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n_y,), 0, K)
    eps = jax.random.normal(k2, (n_y, D))
    y = x[idx] + jnp.sqrt(sigma_diag)[None, :] * eps

    ex, ex2 = _posterior_dim_moments(y, x, sigma_diag)
    scores = (
        -0.5 / sigma_diag[None, :]
        + 0.5 * _e_sq_diff(y, ex, ex2) / jnp.square(sigma_diag)[None, :]
    )
    g = 0.5 / jnp.square(sigma_diag) - jnp.var(scores, axis=0, ddof=1)
    sigma0_diag = jnp.var(x, axis=0, ddof=1)
    factor = 4.0 * jnp.square(sigma_diag) / (sigma0_diag + 2.0 * sigma_diag)
    return g * factor
