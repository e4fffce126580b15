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


def test_log_iv_large_nu_series_regime():
    """At large nu, scipy's scaled ive underflows for all z <~ nu (e.g.
    ive(1535, 100) == 0.0) — log_iv must fall back to the log-space series
    there. Checked via the three-term recurrence
    I_{nu-1}(z) - I_{nu+1}(z) = (2 nu / z) I_nu(z) and continuity with the
    ive branch where both work."""
    scipy_special = pytest.importorskip("scipy.special")
    from pdm_tpu.stats.hypersphere import _bessel_ratio

    for nu in (511.0, 1535.0):
        z = np.array([50.0, 100.0, 400.0])  # series regime
        a, b, c = log_iv(nu - 1, z), log_iv(nu + 1, z), log_iv(nu, z)
        np.testing.assert_allclose(
            np.exp(a - c) - np.exp(b - c), 2 * nu / z, rtol=1e-9
        )
        np.testing.assert_allclose(
            _bessel_ratio(nu, z), np.exp(log_iv(nu + 1, z) - c), rtol=1e-9
        )
        z_ok = np.array([3000.0, 4000.0])  # ive regime
        np.testing.assert_allclose(
            log_iv(nu, z_ok),
            np.log(scipy_special.ive(nu, z_ok)) + z_ok,
            rtol=1e-12,
        )


def test_marginal_stats_high_dimension():
    """d=1024 (the regime the round-2 review showed was broken): S <= 0,
    monotone, -> 0 at high T; C = T dS/dT pointwise; and the TRUE low-T
    angular-Gaussian limit (d-1)/2 at T << 4/d^2."""
    out = marginal_stats(np.logspace(-2, 3, 8), d=1024)
    assert np.all(out["S"] <= 1e-6)
    assert np.all(np.diff(out["S"]) > -1e-6)
    assert abs(out["S"][-1]) < 0.05

    temps = np.logspace(-3, 1, 400)
    s = entropy(1.1, temps, 1024)
    c = heat_capacity(1.1, temps, 1024)
    ds = np.gradient(s, np.log(temps))
    mid = slice(40, 360)
    np.testing.assert_allclose(c[mid], ds[mid], rtol=0.02, atol=1e-3)
    np.testing.assert_allclose(
        heat_capacity(1.0, np.array([1e-7]), 1024), (1024 - 1) / 2, rtol=0.05
    )
