"""Model-based metric and entropy-derivative estimators.

Both estimate thermodynamic quantities through a trained (or analytic)
denoiser's reconstruction error:

    G(lambda) ~ 0.5 * E ||x0 - x0_hat||^2 / T      (Fisher-Rao metric;
                reference utils/stats.py:186-254)
    dS/dlogT  = the same quantity                   (I-MMSE relation;
                reference scripts/compute_stats_empirical.py:12-33)

The two reference call sites noise differently, and we mirror each exactly:

* ``noising="ve"``: xt = x0 + sqrt(T) eps  (linear/VE convention,
  reference utils/stats.py compute_model_metric_stats_batch);
* ``noising="vp"``: xt = sqrt(ab) x0 + sqrt(1-ab) eps via
  ``scheduler.add_noise`` at tau(log T) (reference
  scripts/compute_stats_empirical.py compute_entropy_derivative) — at high
  T the VE input is sqrt(1+T) times larger than anything a VP-trained model
  saw, so the empirical entropy artifact must use VP.

dS/dlogT integrates with the trapezoid rule to an entropy curve.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..models.base import DDPM


@partial(jax.jit, static_argnames=("noising",))
def _model_metric_batch(
    ddpm: DDPM, key: jax.Array, x0: Array, temp: Array, noising: str = "ve"
) -> Array:
    """(n_temps,) batch-mean of 0.5 ||x0 - x0_hat||^2 / T."""

    def per_temp(inp):
        i, t = inp
        log_t = jnp.broadcast_to(jnp.log(t), (x0.shape[0],))
        k = jax.random.fold_in(key, i)
        if noising == "vp":
            tau = ddpm.scheduler.tau_from_log_temp(log_t)
            _, _, xt = ddpm.scheduler.add_noise(k, x0, tau)
        else:
            eps = jax.random.normal(k, x0.shape)
            xt = x0 + jnp.sqrt(t) * eps
        preds = ddpm.get_predictions(xt, log_t)
        err = jnp.sum(
            jnp.square(preds.x0 - x0).reshape(x0.shape[0], -1), axis=-1
        )
        return 0.5 * jnp.mean(err) / t

    return jax.lax.map(per_temp, (jnp.arange(temp.shape[0]), temp))


def model_metric_stats(
    key: jax.Array,
    ddpm: DDPM,
    data: Array,
    temp: np.ndarray,
    n_samples: int = 1024,
    batch_size: int = 256,
    noising: str = "ve",
) -> Dict[str, np.ndarray]:
    """Reference artifact contract: {temp, metric, log_temp,
    dataset_tr_sigma0}. Parity: utils/stats.py compute_model_metric_stats."""
    data2d = jnp.reshape(data, (data.shape[0], -1))
    n = data2d.shape[0]
    temp_j = jnp.asarray(temp, jnp.float32)
    acc = np.zeros(len(temp), np.float64)
    seen = 0
    bi = 0
    while seen < n_samples:
        bs = min(batch_size, n_samples - seen)
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        x0 = jnp.reshape(data2d[idx], (bs, *data.shape[1:]))
        vals = _model_metric_batch(
            ddpm, jax.random.fold_in(key, bi), x0, temp_j, noising
        )
        acc += np.asarray(vals, np.float64) * bs
        seen += bs
        bi += 1
    metric = acc / seen
    tr_sigma0 = float(np.asarray(jnp.var(data2d, axis=0, ddof=1).sum()))
    return {
        "temp": np.asarray(temp),
        "metric": metric,
        "log_temp": np.log(np.asarray(temp)),
        "dataset_tr_sigma0": np.asarray(tr_sigma0),
    }


def empirical_entropy_stats(
    key: jax.Array,
    ddpm: DDPM,
    data: Array,
    temp: np.ndarray,
    n_samples: int = 1024,
    batch_size: int = 256,
) -> Dict[str, np.ndarray]:
    """The reference empirical-stats artifact: dS/dlogT via VP-noised model
    reconstruction error, trapezoid-integrated to entropy and rescaled
    entropy, both anchored to 0 at the MAX temperature.

    Parity: scripts/compute_stats_empirical.py:36-75 (noising via
    scheduler.add_noise, entropy -= entropy[-1], rescaled integrand
    dS/dlogT * sqrt(T)) — with ONE deliberate alignment fix: the
    reference pads the cumulative integral at the TRAILING edge
    (``np.pad(entropy, (0, 1))`` after the cumsum), which shifts every
    entropy value one grid index late relative to its temperature; here
    the 0 is prepended, so entropy[k] is exactly the integral from
    temp[0] to temp[k]. Values differ from a reference-produced .npz by
    one trapezoid per bin (the reference's latent off-by-one, same class
    as the two scheduler knot bugs fixed in round 1).
    """
    out = model_metric_stats(
        key, ddpm, data, temp, n_samples, batch_size, noising="vp"
    )
    curves = integrate_entropy_curves(
        out["metric"], out["temp"], out["log_temp"]
    )
    return {
        "temp": out["temp"],
        "entropy": curves["entropy"],
        "rescaled_entropy": curves["rescaled_entropy"],
        "d_entropy_d_log_temp": out["metric"],
        "log_temp": out["log_temp"],
    }


def integrate_entropy_curves(
    ds: np.ndarray, temp: np.ndarray, log_temp: np.ndarray
) -> Dict[str, np.ndarray]:
    """Trapezoid-integrate dS/dlogT to (entropy, rescaled_entropy), both
    anchored to 0 at the MAX temperature.

    Alignment contract vs the reference (pinned by
    tests/fixtures/empirical_entropy_golden.npz): the reference appends the
    anchor zero AFTER the cumulative sums (torch pad (0,1),
    compute_stats_empirical.py:58-65), which stores the integral up to
    temp[k+1] at index k — every value one grid index early. Here the zero
    is PREPENDED, so entropy[k] is exactly the integral from temp[0] to
    temp[k]; ours[k+1] == reference[k] for the same dS/dlogT input.
    """
    d_log_t = np.diff(log_temp)
    entropy = np.concatenate(
        [[0.0], np.cumsum(0.5 * (ds[1:] + ds[:-1]) * d_log_t)]
    )
    entropy -= entropy[-1]
    sigma = np.sqrt(temp)
    rescaled = np.concatenate(
        [
            [0.0],
            np.cumsum(
                0.5 * (ds[1:] * sigma[1:] + ds[:-1] * sigma[:-1]) * d_log_t
            ),
        ]
    )
    rescaled -= rescaled[-1]
    return {"entropy": entropy, "rescaled_entropy": rescaled}
