"""Model-based metric and entropy-derivative estimators.

Both estimate thermodynamic quantities through a trained (or analytic)
denoiser's reconstruction error, in the linear/VE convention
``xt = x0 + sqrt(T) eps``:

    G(lambda) ~ 0.5 * E ||x0 - x0_hat||^2 / T      (Fisher-Rao metric;
                reference utils/stats.py:186-254)
    dS/dlogT  = the same quantity                   (I-MMSE relation;
                reference scripts/compute_stats_empirical.py:12-33)

integrated with the trapezoid rule to an entropy curve.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..models.base import DDPM


@partial(jax.jit, static_argnames=())
def _model_metric_batch(
    ddpm: DDPM, key: jax.Array, x0: Array, temp: Array
) -> Array:
    """(n_temps,) batch-mean of 0.5 ||x0 - x0_hat||^2 / T."""

    def per_temp(inp):
        i, t = inp
        eps = jax.random.normal(jax.random.fold_in(key, i), x0.shape)
        xt = x0 + jnp.sqrt(t) * eps
        log_t = jnp.broadcast_to(jnp.log(t), (x0.shape[0],))
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
        vals = _model_metric_batch(ddpm, jax.random.fold_in(key, bi), x0, temp_j)
        acc += np.asarray(vals, np.float64) * bs
        seen += bs
        bi += 1
    metric = acc / seen
    tr_sigma0 = float(np.asarray(jnp.var(data2d, axis=0).sum()))
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
    """dS/dlogT via model reconstruction error, trapezoid-integrated to an
    entropy curve (anchored at 0 at the lowest temperature) plus the
    rescaled entropy used for schedule construction.

    Parity: scripts/compute_stats_empirical.py:12-65.
    """
    out = model_metric_stats(key, ddpm, data, temp, n_samples, batch_size)
    ds_dlogt = out["metric"]  # same estimator
    log_t = out["log_temp"]
    entropy = np.concatenate(
        [[0.0], np.cumsum(0.5 * (ds_dlogt[1:] + ds_dlogt[:-1]) * np.diff(log_t))]
    )
    return {
        "temp": out["temp"],
        "d_entropy_d_log_temp": ds_dlogt,
        "entropy": entropy,
        "log_temp": log_t,
    }
