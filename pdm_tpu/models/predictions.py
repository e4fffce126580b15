"""Parametrization algebra: convert any model head output into all three
standard parametrizations (x0 / eps / score), given alpha_bar.

The three are linearly related through the VP forward process
``xt = sqrt(ab) x0 + sqrt(1-ab) eps`` and ``score = -eps / sqrt(1-ab)``.

Capability parity: reference ``diffusion/ddpm/ddpm.py:12-28``
(DDPMPredictions). Pure function on arrays — usable inside jit/scan/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from ..core.temperature import bcast_right

PARAMETRIZATIONS = ("x0", "eps", "score")


class Predictions(NamedTuple):
    pred: Array
    x0: Array
    eps: Array
    score: Array


def convert_prediction(
    pred: Array, xt: Array, alpha_bar: Array, parametrization: str
) -> Predictions:
    """alpha_bar: per-sample (B,) or scalar; broadcast over object dims."""
    ab = bcast_right(jnp.asarray(alpha_bar), xt.ndim)
    sqrt_ab = jnp.sqrt(ab)
    omab = 1.0 - ab
    sqrt_omab = jnp.sqrt(omab)

    if parametrization == "x0":
        x0 = pred
        eps = (xt - pred * sqrt_ab) / sqrt_omab
        score = -eps / sqrt_omab
    elif parametrization == "eps":
        x0 = (xt - pred * sqrt_omab) / sqrt_ab
        eps = pred
        score = -eps / sqrt_omab
    elif parametrization == "score":
        x0 = (xt + pred * omab) / sqrt_ab
        eps = -pred * sqrt_omab
        score = pred
    else:
        raise ValueError(f"unknown parametrization: {parametrization!r}")
    return Predictions(pred=pred, x0=x0, eps=eps, score=score)


def training_target(
    x0: Array, eps: Array, alpha_bar: Array, parametrization: str
) -> Array:
    """The regression target for a given parametrization.

    Parity: reference ddpm_trainer.py:86-91.
    """
    if parametrization == "x0":
        return x0
    if parametrization == "eps":
        return eps
    if parametrization == "score":
        omab = bcast_right(1.0 - jnp.asarray(alpha_bar), x0.ndim)
        return -eps / jnp.sqrt(omab)
    raise ValueError(f"unknown parametrization: {parametrization!r}")
