"""Knot-based (interpolated) schedulers.

``InterpolatedScheduler`` realizes the ``tau <-> log_temp`` bijection by
piecewise-linear interpolation of a monotone knot table. The knot arrays are
pytree *leaves*, so a knot schedule is differentiable end-to-end — this is
what the schedule optimizer exploits.

Constructors derive the knots from measured statistics:

* ``entropy_scheduler``  — timestamps proportional to the normalized
  data entropy S(T) from the forward-stats sweep (entropy-uniform schedule),
  with optional low-temperature linear extrapolation in log T.
* ``metric_scheduler``   — timestamps proportional to normalized Fisher-Rao
  arc length r(lambda) = int sqrt(G(lambda')) dlambda' (geodesic schedule).
* ``custom_scheduler``   — knots loaded from an .npz artifact.
* ``from_alpha_bars``    — knots from a pretrained model's alphas_cumprod
  table (reference's "diffusers" schedule type).

Capability parity: reference ``diffusion/scheduler/{interpolated,entropy,
metric,custom,diffusers}.py`` and ``utils/stats.py:314-322``
(extrapolate_entropy).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.interp import interp1d
from ..core.temperature import log_temp_from_alpha_bar
from .base import Scheduler


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InterpolatedScheduler(Scheduler):
    """Piecewise-linear tau <-> log_temp map from monotone knots.

    ``timestamps`` ascending in [0, 1]; ``log_temp`` ascending.
    """

    timestamps: Array
    log_temp: Array

    def log_temp_from_tau(self, tau: Array) -> Array:
        return interp1d(self.timestamps, self.log_temp, tau)

    def tau_from_log_temp(self, log_temp: Array) -> Array:
        return interp1d(self.log_temp, self.timestamps, log_temp)


# ---------------------------------------------------------------------------
# Knot construction (host-side, runs once at setup — numpy is deliberate)
# ---------------------------------------------------------------------------


def extrapolate_entropy(
    temp: np.ndarray, entropy: np.ndarray, min_temp: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Extend S(log T) to ``min_temp`` by continuing the max-slope segment.

    Below the temperature where dS/dlogT is steepest, the measured entropy
    flattens out only because of the finite dataset; the physical entropy
    keeps decreasing. Replace everything below the max-slope knot with the
    tangent line. Parity: reference utils/stats.py:314-322.
    """
    temp = np.asarray(temp, dtype=np.float64)
    entropy = np.asarray(entropy, dtype=np.float64)
    # Prepend only when extending *down*: the reference prepends whenever
    # temp[0] != min_temp, which un-sorts the grid if min_temp > temp[0].
    if min_temp < temp[0]:
        temp = np.concatenate([[min_temp], temp])
        entropy = np.concatenate([[entropy[0]], entropy])
    log_temp = np.log(temp)
    slope = np.diff(entropy) / np.diff(log_temp)
    idx = int(np.argmax(slope))
    head = (log_temp[:idx] - log_temp[idx]) * slope[idx] + entropy[idx]
    return temp, np.concatenate([head, entropy[idx:]])


def entropy_scheduler(
    temp: np.ndarray,
    entropy: np.ndarray,
    *,
    extrapolate: bool = True,
    min_temp: float = 1e-4,
    max_temp: float = np.inf,
) -> InterpolatedScheduler:
    """Entropy-uniform schedule: equal entropy production per unit tau."""
    temp = np.asarray(temp, dtype=np.float64)
    entropy = np.asarray(entropy, dtype=np.float64)
    if extrapolate:
        temp, entropy = extrapolate_entropy(temp, entropy, min_temp)
        mask = temp <= max_temp
        temp, entropy = temp[mask], entropy[mask]
    timestamps = entropy - entropy.min()
    timestamps = timestamps / timestamps.max()
    # Monte-Carlo noise can make S(T) locally non-monotone (it saturates at
    # both ends); a knot table with non-sorted timestamps breaks the
    # searchsorted interpolation (a latent flaw in the reference, which
    # normalizes by max() that may occur before the last knot). Keep the
    # strictly-increasing subsequence.
    timestamps, log_temp = _monotone_knots(timestamps, np.log(temp))
    return InterpolatedScheduler(
        timestamps=jnp.asarray(timestamps, dtype=jnp.float32),
        log_temp=jnp.asarray(log_temp, dtype=jnp.float32),
    )


def _monotone_knots(
    timestamps: np.ndarray, log_temp: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Reduce a noisy knot table to a strictly-increasing (in both
    coordinates) subsequence via a running max, dropping ties."""
    run_max = np.maximum.accumulate(timestamps)
    keep = np.ones(len(timestamps), dtype=bool)
    keep[1:] = timestamps[1:] > run_max[:-1]
    return timestamps[keep], log_temp[keep]


def fisher_rao_arc_length(
    log_temp: np.ndarray, metric: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Cumulative Fisher-Rao distance along the temperature axis.

    r(lambda) = int_{lambda_min}^{lambda} sqrt(G) dlambda (trapezoid rule).
    Returns (sorted log_temp, r). Shared by the geodesic schedule and the
    check_distance diagnostic CLI.
    """
    log_temp = np.asarray(log_temp, dtype=np.float64)
    metric = np.asarray(metric, dtype=np.float64)
    order = np.argsort(log_temp)
    log_temp, metric = log_temp[order], metric[order]
    sqrt_g = np.sqrt(np.clip(metric, 0.0, None))
    dr = 0.5 * (sqrt_g[1:] + sqrt_g[:-1]) * np.diff(log_temp)
    return log_temp, np.concatenate([[0.0], np.cumsum(dr)])


def metric_scheduler(log_temp: np.ndarray, metric: np.ndarray) -> InterpolatedScheduler:
    """Geodesic schedule: tau proportional to Fisher-Rao arc length,
    normalized to [0, 1]. Parity: reference scheduler/metric.py:11-35.
    """
    log_temp, r = fisher_rao_arc_length(log_temp, metric)
    timestamps = r / r[-1]
    return InterpolatedScheduler(
        timestamps=jnp.asarray(timestamps, dtype=jnp.float32),
        log_temp=jnp.asarray(log_temp, dtype=jnp.float32),
    )


def entropy_scheduler_from_npz(
    path: str, *, extrapolate: bool, min_temp: float, max_temp: float
) -> InterpolatedScheduler:
    stats = np.load(path)
    return entropy_scheduler(
        stats["temp"], stats["entropy"],
        extrapolate=extrapolate, min_temp=min_temp, max_temp=max_temp,
    )


def metric_scheduler_from_npz(path: str) -> InterpolatedScheduler:
    stats = np.load(path)
    return metric_scheduler(stats["log_temp"], stats["metric"])


def custom_scheduler(path: str) -> InterpolatedScheduler:
    """Knots from an .npz artifact holding ``log_temp`` (+optional
    ``timestamps``). Parity: reference scheduler/custom.py."""
    stats = np.load(path)
    log_temp = np.asarray(stats["log_temp"], dtype=np.float64)
    if "timestamps" in stats:
        timestamps = np.asarray(stats["timestamps"], dtype=np.float64)
    else:
        timestamps = np.linspace(0.0, 1.0, len(log_temp))
    return InterpolatedScheduler(
        timestamps=jnp.asarray(timestamps, dtype=jnp.float32),
        log_temp=jnp.asarray(log_temp, dtype=jnp.float32),
    )


def from_alpha_bars(alpha_bar: np.ndarray) -> InterpolatedScheduler:
    """Schedule induced by a pretrained model's alphas_cumprod table.

    Parity: reference scheduler/diffusers.py (FromDiffusersScheduler).
    """
    alpha_bar = jnp.asarray(alpha_bar, dtype=jnp.float32)
    log_temp = log_temp_from_alpha_bar(alpha_bar)
    timestamps = jnp.linspace(0.0, 1.0, log_temp.shape[0])
    return InterpolatedScheduler(timestamps=timestamps, log_temp=log_temp)
