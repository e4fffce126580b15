"""Hypersphere closed-form module and misc utils."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.stats.hypersphere import (
    entropy, heat_capacity, internal_energy, log_iv, marginal_stats,
)
from pdm_tpu.utils.misc import batch_jacobian, compute_cdf


def test_log_iv_regimes():
    scipy_special = pytest.importorskip("scipy.special")
    nu = 4.0
    # middle regime exact
    z = np.array([1.0, 5.0, 50.0])
    np.testing.assert_allclose(
        log_iv(nu, z), np.log(scipy_special.iv(nu, z)), rtol=1e-10
    )
    # large regime matches the exponentially-scaled scipy ive (iv itself
    # overflows — exactly why log_iv exists)
    z = np.array([1e3])
    np.testing.assert_allclose(
        log_iv(nu, z), np.log(scipy_special.ive(nu, z)) + z, rtol=1e-2
    )
    # small regime: series head
    z = np.array([1e-4])
    np.testing.assert_allclose(
        log_iv(nu, z), np.log(scipy_special.iv(nu, z)), rtol=1e-3
    )


def test_high_temperature_limits():
    """T -> inf: posterior -> prior, so S -> 0 and C = Var[H]/T^2 ~ T/T^2
    -> 0; C peaks at intermediate T (the 'phase transition' signature)."""
    d = 10
    temps = np.logspace(-3, 4, 15)
    out = marginal_stats(temps, d=d)
    np.testing.assert_allclose(out["S"][-1], 0.0, atol=0.01)
    assert out["C"][-1] < 0.05
    # continuum low-T limit: angular Gaussian fluctuations give (d-1)/2
    np.testing.assert_allclose(out["C"][0], (d - 1) / 2.0, rtol=0.05)
    # S monotone increasing in T
    assert np.all(np.diff(out["S"]) > -1e-6)


def test_entropy_consistency_pointwise():
    """At FIXED r the thermodynamic identity C(r,T) = T dS(r,T)/dT holds
    (the marginal averages pick up a transport term from dp(r|T)/dT, so
    the identity is pointwise only)."""
    d = 8
    r = 1.3
    temps = np.logspace(-1, 1, 400)
    s = entropy(r, temps, d)
    c = heat_capacity(r, temps, d)
    ds_dlogt = np.gradient(s, np.log(temps))
    mid = slice(40, 360)
    np.testing.assert_allclose(c[mid], ds_dlogt[mid], rtol=0.05, atol=0.02)


def test_batch_jacobian():
    def f(x):
        return jnp.stack([x[:, 0] * x[:, 1], x[:, 0] ** 2], axis=1)

    x = jnp.asarray([[2.0, 3.0], [1.0, -1.0]])
    jac = np.asarray(batch_jacobian(f, x))
    assert jac.shape == (2, 2, 2)
    np.testing.assert_allclose(jac[0], [[3.0, 2.0], [4.0, 0.0]], atol=1e-5)


def test_compute_cdf():
    x = np.linspace(0, 1, 11)
    p = np.ones(11)
    cdf = compute_cdf(x, p)
    assert cdf[0] == 0.0 and cdf[-1] == 1.0
    assert np.all(np.diff(cdf) >= 0)
