"""Scheduler round-trips, closed-form checks, and forward-process parity.

Oracles (SURVEY §4): the linear-beta continuum formula checked against the
discrete DDPM beta product, exact inverse round-trips for all analytic
schedulers, and interpolated-scheduler knot recovery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.core.temperature import (
    alpha_bar_from_log_temp,
    log_temp_from_alpha_bar,
    one_minus_alpha_bar_from_log_temp,
)
from pdm_tpu.core.interp import interp1d
from pdm_tpu.schedulers.analytic import (
    CosineScheduler,
    LinearBetaScheduler,
    LogSNRScheduler,
)
from pdm_tpu.schedulers.interpolated import (
    InterpolatedScheduler,
    entropy_scheduler,
    extrapolate_entropy,
    from_alpha_bars,
    metric_scheduler,
)

ALL_SCHEDULERS = [
    LinearBetaScheduler(1e-4, 1e4),
    CosineScheduler(1e-2, 1e4),
    LogSNRScheduler(1e-3, 1e3),
]


def test_temperature_algebra_roundtrip():
    # fp32 alpha_bar quantizes (1 - ab) to ~1e-7 steps near 1, so the
    # round-trip below log T ~ -12 carries inherent representation error.
    log_temp = jnp.linspace(-14.0, 14.0, 101)
    ab = alpha_bar_from_log_temp(log_temp)
    np.testing.assert_allclose(log_temp_from_alpha_bar(ab), log_temp, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(ab + one_minus_alpha_bar_from_log_temp(log_temp)), 1.0, rtol=1e-6
    )


@pytest.mark.parametrize("sched", ALL_SCHEDULERS, ids=lambda s: type(s).__name__)
def test_roundtrip(sched):
    tau = jnp.linspace(1e-3, 1.0, 257)
    lt = sched.log_temp_from_tau(tau)
    tau_back = sched.tau_from_log_temp(lt)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sched", ALL_SCHEDULERS, ids=lambda s: type(s).__name__)
def test_endpoints(sched):
    lt0 = float(sched.log_temp_from_tau(jnp.zeros(())))
    lt1 = float(sched.log_temp_from_tau(jnp.ones(())))
    np.testing.assert_allclose(lt0, np.log(sched.min_temp), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(lt1, np.log(sched.max_temp), rtol=1e-3, atol=1e-3)


def test_linear_beta_matches_discrete_beta_product():
    """Continuum-limit formula vs the discrete DDPM linear-beta product
    (formulas.md 'Analytical approximation'): with beta_t linear from ~0 to
    beta_N over N steps, log alpha_bar(tau) ~ -tau^2 N beta_N / 2."""
    N = 4000
    beta_max = 0.02
    betas = np.linspace(beta_max / N, beta_max, N)
    alpha_bar_disc = np.cumprod(1.0 - betas)
    temp_disc = (1.0 - alpha_bar_disc) / alpha_bar_disc

    max_temp = temp_disc[-1]
    min_temp = temp_disc[0]
    sched = LinearBetaScheduler(float(min_temp), float(max_temp))
    tau = jnp.asarray((np.arange(1, N + 1)) / N, dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    lt = np.asarray(sched.log_temp_from_tau(tau))
    # mid-range comparison (endpoints match by construction)
    sl = slice(N // 10, 9 * N // 10)
    np.testing.assert_allclose(lt[sl], np.log(temp_disc)[sl], atol=0.08)


def test_cosine_is_tan_squared():
    """Un-rescaled cosine schedule: T = tan^2(pi tau / 2) (Nichol&Dhariwal
    cosine alpha_bar = cos^2(pi tau / 2) in temperature form)."""
    sched = CosineScheduler(0.0, 1e12)
    tau = jnp.linspace(0.05, 0.6, 10)
    lt = np.asarray(sched.log_temp_from_tau(tau))
    # shift/scale nearly identity for this temp range at small tau
    expected = 2 * np.log(np.tan(np.asarray(tau) * float(sched._scale) + float(sched._shift)))
    np.testing.assert_allclose(lt, expected, rtol=1e-5)


def test_interp1d_matches_numpy_and_extrapolates():
    xk = jnp.asarray([0.0, 1.0, 3.0, 7.0])
    yk = jnp.asarray([1.0, 2.0, 0.0, 8.0])
    xq = jnp.asarray([0.5, 2.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(interp1d(xk, yk, xq)), np.interp(np.asarray(xq), xk, yk), rtol=1e-6
    )
    # linear extrapolation along edge segments (reference interp1d semantics)
    np.testing.assert_allclose(float(interp1d(xk, yk, jnp.asarray(-1.0))), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(interp1d(xk, yk, jnp.asarray(9.0))), 12.0, atol=1e-5)


def test_interpolated_scheduler_roundtrip():
    timestamps = jnp.asarray(np.linspace(0, 1, 17))
    log_temp = jnp.asarray(np.sort(np.random.RandomState(0).uniform(-8, 8, 17)))
    sched = InterpolatedScheduler(timestamps, log_temp)
    tau = jnp.asarray(np.linspace(0, 1, 101, dtype=np.float32))
    lt = sched.log_temp_from_tau(tau)
    np.testing.assert_allclose(
        np.asarray(sched.tau_from_log_temp(lt)), np.asarray(tau), atol=1e-5
    )
    # knots are recovered exactly
    np.testing.assert_allclose(
        np.asarray(sched.log_temp_from_tau(timestamps)), np.asarray(log_temp), atol=1e-5
    )


def test_entropy_scheduler_uniformizes_entropy():
    """By construction, entropy is linear in tau for the entropy schedule."""
    temp = np.logspace(-3, 3, 50)
    entropy = np.tanh(np.log(temp))  # monotone synthetic S(log T)
    sched = entropy_scheduler(temp, entropy, extrapolate=False)
    tau = jnp.asarray(np.linspace(0, 1, 33, dtype=np.float32))
    lt = np.asarray(sched.log_temp_from_tau(tau))
    s_of_tau = np.interp(lt, np.log(temp), entropy)
    s_norm = (s_of_tau - entropy.min()) / (entropy.max() - entropy.min())
    np.testing.assert_allclose(s_norm, np.asarray(tau), atol=2e-2)


def test_extrapolate_entropy_tangent_line():
    temp = np.logspace(-2, 2, 20)
    entropy = np.log1p(temp) / 5  # slope grows with T here; max slope at end-ish
    t2, s2 = extrapolate_entropy(temp, entropy, min_temp=1e-4)
    assert t2[0] == 1e-4
    assert len(t2) == len(temp) + 1
    assert np.all(np.diff(s2) >= -1e-12)


def test_metric_scheduler_constant_metric_is_logsnr():
    """With constant G, arc length is linear in log T -> log-SNR schedule."""
    log_temp = np.linspace(-5, 5, 40)
    metric = np.full(40, 2.0)
    sched = metric_scheduler(log_temp, metric)
    tau = jnp.asarray(np.linspace(0, 1, 21, dtype=np.float32))
    lt = np.asarray(sched.log_temp_from_tau(tau))
    np.testing.assert_allclose(lt, -5 + 10 * np.asarray(tau), atol=1e-4)


def test_from_alpha_bars():
    betas = np.linspace(1e-4, 2e-2, 1000)
    ab = np.cumprod(1 - betas).astype(np.float32)
    sched = from_alpha_bars(ab)
    lt = float(sched.log_temp_from_tau(jnp.asarray(0.0)))
    np.testing.assert_allclose(lt, np.log((1 - ab[0]) / ab[0]), rtol=1e-4)


def test_add_noise_statistics():
    sched = LogSNRScheduler(1e-2, 1e2)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((512, 8))
    tau, eps, xt = sched.add_noise(key, x0)
    assert tau.shape == (512,)
    ab = alpha_bar_from_log_temp(sched.log_temp_from_tau(tau))
    resid = (xt - jnp.sqrt(ab)[:, None] * x0) / jnp.sqrt(1 - ab)[:, None]
    np.testing.assert_allclose(np.asarray(resid), np.asarray(eps), atol=1e-4)
    # eps is standard normal
    assert abs(float(eps.mean())) < 0.05
    assert abs(float(eps.std()) - 1.0) < 0.05


def test_scheduler_is_pytree_and_jittable():
    sched = InterpolatedScheduler(
        jnp.linspace(0, 1, 5), jnp.linspace(-2.0, 2.0, 5)
    )

    @jax.jit
    def f(s, tau):
        return s.log_temp_from_tau(tau)

    out = f(sched, jnp.asarray(0.5))
    np.testing.assert_allclose(float(out), 0.0, atol=1e-6)
    # differentiable w.r.t. knots (schedule optimization relies on this)
    g = jax.grad(lambda s: f(s, jnp.asarray(0.5)).sum())(sched)
    assert float(jnp.abs(g.log_temp).sum()) > 0
