"""Stats pipelines vs closed-form physics oracles (SURVEY §4):
Gaussian Fisher-Rao metric, hypersphere Bessel thermodynamics, model-based
metric vs analytic metric, kNN op vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.models.base import TrueDDPM
from pdm_tpu.ops.knn import knn_sqdist
from pdm_tpu.schedulers.analytic import LogSNRScheduler
from pdm_tpu.stats.mc_metric import (
    metric_matrix_diag,
    metric_scalar,
    rescaled_metric_diag,
)
from pdm_tpu.stats.model_metric import empirical_entropy_stats, model_metric_stats
from pdm_tpu.stats.sweep import forward_stats, metric_stats, thermo_sweep
from pdm_tpu.utils.synthetic import sample_on_hypersphere


def g_lambda_gaussian(sigma_sq, sigma0_sq=1.0):
    """Closed-form G(lambda) for p(x)=N(0, sigma0^2), lambda = log sigma^2:
    G = 0.5 s0^2 (s0^2 + 2 s^2) / (s0^2 + s^2)^2  (derivation.tex §3)."""
    return 0.5 * sigma0_sq * (sigma0_sq + 2 * sigma_sq) / (sigma0_sq + sigma_sq) ** 2


def g_rescaled_gaussian(sigma_sq, sigma0_sq=1.0):
    """G_tilde(sigma^2) = 2 s0^2 / (s0^2 + s^2)^2."""
    return 2 * sigma0_sq / (sigma0_sq + sigma_sq) ** 2


def test_metric_scalar_vs_gaussian_closed_form():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(42), (10_000, 1))
    for lam in np.linspace(-3, 3, 7):
        got = float(metric_scalar(jnp.asarray(lam), x, key, n_y=10_000))
        want = g_lambda_gaussian(np.exp(lam))
        np.testing.assert_allclose(got, want, rtol=0.15, atol=0.02)


def test_metric_matrix_diag_vs_gaussian_closed_form():
    key = jax.random.PRNGKey(1)
    D = 4
    x = jax.random.normal(jax.random.PRNGKey(43), (8_000, D))
    lam = jnp.asarray(np.linspace(-1.5, 1.5, D), jnp.float32)
    got = np.asarray(metric_matrix_diag(lam, x, key, n_y=8_000))
    want = np.array([g_lambda_gaussian(np.exp(l)) for l in np.asarray(lam)])
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.03)


def test_rescaled_metric_vs_gaussian_closed_form():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.PRNGKey(44), (10_000, 1))
    for s in np.logspace(-1.5, 1.5, 7):
        got = float(rescaled_metric_diag(jnp.asarray([s], jnp.float32), x, key, n_y=10_000)[0])
        want = g_rescaled_gaussian(s)
        np.testing.assert_allclose(got, want, rtol=0.2, atol=0.05)


def test_empirical_metric_sweep_vs_gaussian_closed_form():
    """The data-space estimator Var_p[H/T] == G(lambda) for Gaussian data
    (the estimator the reference derives in stats.py:71-111)."""
    rng = np.random.RandomState(3)
    data = rng.randn(20_000, 1).astype(np.float32)
    temp = np.logspace(-1.2, 1.2, 7)
    out = metric_stats(
        jax.random.PRNGKey(3), jnp.asarray(data), temp, n_samples=512,
        batch_size=512,
    )
    want = g_lambda_gaussian(temp)
    np.testing.assert_allclose(out["metric"], want, rtol=0.25, atol=0.03)
    assert abs(out["dataset_tr_sigma0"] - 1.0) < 0.05


def test_forward_stats_gaussian_entropy():
    """Gaussian closed form: for p(x)=N(0, s0^2 I_d), the posterior is
    Gaussian with variance v = s0^2 T / (s0^2 + T) per dim and the dataset
    entropy estimator converges (N large) to
    S = d/2 [log(v / (2 pi s0^4 / (2 pi e ... )))] — compare against the
    direct formula S = log Z + U/T averaged analytically:
    S_cont = (d/2) log(T / (s0^2 + T)) + d/2 * s0^2/(s0^2+T) ... easier:
    use the identity S(T) = -KL + const by MC: check limits + monotonicity
    + midpoint against a numerically-integrated 1-D oracle."""
    rng = np.random.RandomState(5)
    s0 = 1.0
    data = (s0 * rng.randn(30_000, 1)).astype(np.float32)
    temp = np.logspace(-3, 3, 13)
    out = forward_stats(
        jax.random.PRNGKey(4), jnp.asarray(data), temp, n_samples=512,
        batch_size=512,
    )
    S = out["entropy"]
    assert np.all(np.diff(S) > -1e-3)
    np.testing.assert_allclose(S[-1], 0.0, atol=0.02)
    # Continuous-prior oracle (valid while N >> N_eff): for 1-D Gaussian,
    # S_cont(T) = 0.5 * [log(T/(s0^2+T)) + s0^2/(s0^2+T)]... derive:
    # posterior N(mu, v), v = s0^2 T/(s0^2+T);
    # S = E[log Z] + E[U]/T with Z = int phi(y) e^{-(x-y)^2/2T} dy
    #   = sqrt(T/(s0^2+T)) * e^{-x^2/(2(s0^2+T))} (phi standard normal pdf
    #     folded in), E[U] = (v + E[(x-mu)^2 term]) ... simpler: use
    #     S = 0.5 log(v / s0^2) + 0.5  - [differential-entropy identity:
    #     S = H(posterior) - H(prior) in nats]
    v = s0**2 * temp / (s0**2 + temp)
    S_cont = 0.5 * np.log(v / s0**2) + 0.5 * (1 - v / temp) + 0.5 * (v / temp - 1)
    # H(post)-H(prior) = 0.5 log(v/s0^2); exact for Gaussians:
    S_cont = 0.5 * np.log(v / s0**2)
    mid = slice(3, 9)
    np.testing.assert_allclose(S[mid], S_cont[mid], atol=0.06)


def test_hypersphere_entropy_vs_bessel():
    """Known-answer physics: uniform distribution on the unit sphere in
    R^d has closed-form log Z/U/S via modified Bessel functions
    (reference hypersphere.ipynb cell 0). The MC dataset estimator must
    reproduce S(T) in the continuum regime."""
    scipy_special = pytest.importorskip("scipy.special")
    from scipy.integrate import quad
    from scipy.special import iv, loggamma

    d = 10

    def logiv(nu, z):
        z = np.asarray(z, np.float64)
        small, large = 1e-2 * (nu + 1), 1e2 * (nu + 1)
        out = np.where(
            z < small,
            -loggamma(nu + 1) + nu * np.log(np.maximum(z, 1e-300) / 2),
            np.where(
                z > large,
                z - 0.5 * np.log(2 * np.pi * np.maximum(z, 1e-300)),
                np.log(np.maximum(iv(nu, np.minimum(z, large)), 1e-300)),
            ),
        )
        return out

    nu = (d - 2) / 2

    def log_Z(r, T):
        return (
            loggamma(d / 2)
            - (r**2 + 1) / (2 * T)
            + nu * (np.log(2 * T) - np.log(r))
            + logiv(nu, r / T)
        )

    def U(r, T):
        z = r / T
        return 0.5 * (r**2 + 1) - r * np.exp(logiv(nu + 1, z) - logiv(nu, z))

    def S_point(r, T):
        return log_Z(r, T) + U(r, T) / T

    def p_r(r, T):
        z = r / T
        return np.exp(
            (d / 2) * np.log(r) - (r**2 + 1) / (2 * T) - np.log(T) + logiv(nu, z)
        )

    temps = np.logspace(-1.5, 1.0, 6)
    S_oracle = np.array(
        [
            quad(lambda r: p_r(r, t) * S_point(r, t), 0, 3 * np.sqrt(1 + t))[0]
            for t in temps
        ]
    )

    data = sample_on_hypersphere(d, n=30_000, radius=1.0, seed=7)
    out = forward_stats(
        jax.random.PRNGKey(7), jnp.asarray(data), temps, n_samples=512,
        batch_size=512,
    )
    np.testing.assert_allclose(out["entropy"], S_oracle, atol=0.15)


def test_model_metric_matches_empirical_for_true_model():
    """With the Bayes-optimal denoiser, 0.5 E||x0-x0_hat||^2/T equals the
    posterior-variance metric in the Gaussian case."""
    rng = np.random.RandomState(8)
    data = rng.randn(20_000, 1, 1, 1).astype(np.float32)
    sched = LogSNRScheduler(1e-3, 1e3)
    ddpm = TrueDDPM(scheduler=sched, train_data=jnp.asarray(data))
    temp = np.logspace(-1, 1, 5)
    out = model_metric_stats(
        jax.random.PRNGKey(8), ddpm, jnp.asarray(data), temp,
        n_samples=512, batch_size=256,
    )
    # The estimator feeds VE-noised xt = x0 + sqrt(T) eps into the VP
    # posterior model (reference semantics, stats.py:186-216). For Gaussian
    # data the VP posterior mean is m = xt / sqrt(1+T), so
    # E||x0 - m||^2 = (1 - 1/sqrt(1+T))^2 + T/(1+T) and
    # metric = 0.5 [ (1-1/sqrt(1+T))^2 / T + 1/(1+T) ]  (dense-MC checked).
    want = 0.5 * ((1 - 1 / np.sqrt(1 + temp)) ** 2 / temp + 1 / (1 + temp))
    np.testing.assert_allclose(out["metric"], want, rtol=0.3, atol=0.02)


def test_empirical_entropy_integration():
    rng = np.random.RandomState(9)
    data = rng.randn(10_000, 1, 1, 1).astype(np.float32)
    sched = LogSNRScheduler(1e-3, 1e3)
    ddpm = TrueDDPM(scheduler=sched, train_data=jnp.asarray(data))
    temp = np.logspace(-2, 2, 9)
    out = empirical_entropy_stats(
        jax.random.PRNGKey(9), ddpm, jnp.asarray(data), temp,
        n_samples=256, batch_size=256,
    )
    # VP noising (the reference empirical-stats convention) into the exact
    # posterior model: per-dim MMSE for unit-Gaussian data is T/(1+T), so
    # dS/dlogT = 0.5 * MMSE / T = 0.5/(1+T) — the Gaussian posterior-entropy
    # derivative d/dlogT [0.5 log(2 pi e T/(1+T))]. Integrate it on a fine
    # grid and re-anchor to 0 at max temperature (reference contract).
    tf = np.logspace(np.log10(temp[0]), np.log10(temp[-1]), 2001)
    integrand = 0.5 / (1 + tf)
    cum = np.concatenate(
        [[0.0], np.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * np.diff(np.log(tf)))]
    )
    want = np.interp(np.log(temp), np.log(tf), cum)
    want -= want[-1]
    np.testing.assert_allclose(out["entropy"], want, atol=0.1)
    assert out["entropy"][-1] == 0.0  # zero-at-max anchor
    assert "rescaled_entropy" in out and out["rescaled_entropy"][-1] == 0.0
    assert np.all(out["d_entropy_d_log_temp"] > 0)


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(10)
    x = rng.randn(300, 5).astype(np.float32)
    got = np.asarray(knn_sqdist(jnp.asarray(x), k=3, chunk_size=64))
    d = ((x[:, None] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, 2]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_metric_stats_regularization_floor():
    """With a global floor, the metric never falls below G_reg(T)."""
    rng = np.random.RandomState(11)
    data = rng.randn(2_000, 2).astype(np.float32)
    temp = np.logspace(-4, 0, 5)
    out = metric_stats(
        jax.random.PRNGKey(11), jnp.asarray(data), temp, n_samples=128,
        batch_size=128, regularize=True,
    )
    s2 = 1e-3
    g_reg = 0.5 * s2 * (s2 + 2 * temp) / (s2 + temp) ** 2
    assert np.all(out["metric"] >= g_reg - 1e-6)


def test_metric_stats_adaptive_knn_runs():
    rng = np.random.RandomState(12)
    data = rng.randn(1_000, 4).astype(np.float32)
    temp = np.logspace(-2, 0, 3)
    out = metric_stats(
        jax.random.PRNGKey(12), jnp.asarray(data), temp, n_samples=64,
        batch_size=64, regularize=True, adaptive_knn=True, knn_k=3,
    )
    assert np.all(np.isfinite(out["metric"])) and np.all(out["metric"] > 0)


def test_empirical_entropy_golden_alignment():
    """Artifact-level interop with the reference empirical-stats npz,
    pinned by a torch-generated fixture (gen_empirical_entropy_golden.py)
    rather than argued in a docstring: the reference appends the anchor
    zero AFTER the cumsum (compute_stats_empirical.py:58-65), storing the
    integral up to temp[k+1] at index k; we prepend it, so
    ours[k+1] == reference[k] exactly (same dS/dlogT input)."""
    import os

    from pdm_tpu.stats.model_metric import integrate_entropy_curves

    fix = np.load(
        os.path.join(
            os.path.dirname(__file__), "fixtures", "empirical_entropy_golden.npz"
        )
    )
    temp = fix["temp"].astype(np.float64)
    ds = fix["d_entropy_d_log_temp"].astype(np.float64)
    ours = integrate_entropy_curves(ds, temp, np.log(temp))

    for key in ("entropy", "rescaled_entropy"):
        ref = fix[key].astype(np.float64)
        got = ours[key]
        # documented one-index alignment: ours is shifted one grid index
        # late relative to the reference's trailing-edge pad
        # fixture arrays are float32 (torch cumsum); ours recompute in
        # float64 — tolerance covers fp32 accumulation only
        np.testing.assert_allclose(got[1:], ref[:-1], rtol=1e-4, atol=5e-4)
        # both anchor max-temperature entropy at 0
        assert got[-1] == 0.0 and abs(ref[-2]) < 1e-5
        # sanity vs the closed form: entropy drop from max-T to min-T is
        # ~ integral of 0.5 d sigma0^2/(sigma0^2+T) dlogT
        if key == "entropy":
            d, s0 = float(fix["dim"]), float(fix["sigma0_sq"])
            exact = -0.5 * d * (
                np.log1p(s0 / temp[0]) - np.log1p(s0 / temp[-1])
            )
            assert abs(got[0] - exact) < 0.05 * abs(exact)


def test_merge_moments_exact():
    """merge_moments(chunk A, chunk B) must equal the single-shot op on
    the concatenated dataset — the host-streaming analogue of the
    shard_map psum merge, for both moment layouts."""
    import jax
    import jax.numpy as jnp

    from pdm_tpu.ops.boltzmann import boltzmann_moments, merge_moments
    from pdm_tpu.ops.boltzmann_sweep import boltzmann_sweep

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((8, 12)), jnp.float32)
    ya = jnp.asarray(rng.standard_normal((37, 12)), jnp.float32)
    yb = jnp.asarray(rng.standard_normal((21, 12)), jnp.float32)
    y = jnp.concatenate([ya, yb], axis=0)

    # single-temperature layout (B,), with the mean channel
    inv_t = 1.0 / 0.37
    full = boltzmann_moments(x, y, inv_temp=inv_t, compute_mean=True)
    merged = merge_moments(
        boltzmann_moments(x, ya, inv_temp=inv_t, compute_mean=True),
        boltzmann_moments(x, yb, inv_temp=inv_t, compute_mean=True),
    )
    for name in ("log_z", "e1_hat", "e2_hat"):
        np.testing.assert_allclose(
            np.asarray(getattr(merged, name)),
            np.asarray(getattr(full, name)), rtol=1e-5, atol=1e-5,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(merged.mean), np.asarray(full.mean), rtol=1e-5,
        atol=1e-5,
    )
    # shift-invariant derived quantities
    np.testing.assert_allclose(
        np.asarray(merged.entropy(58)), np.asarray(full.entropy(58)),
        rtol=1e-5, atol=1e-5,
    )

    # sweep layout (n_temps, B)
    eps = jnp.asarray(rng.standard_normal((8, 12)), jnp.float32)
    temps = jnp.asarray(np.logspace(-2, 1, 7), jnp.float32)
    full_s = boltzmann_sweep(x, eps, y, temps)
    merged_s = merge_moments(
        boltzmann_sweep(x, eps, ya, temps),
        boltzmann_sweep(x, eps, yb, temps),
    )
    np.testing.assert_allclose(
        np.asarray(merged_s.log_z), np.asarray(full_s.log_z), rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(merged_s.var), np.asarray(full_s.var), rtol=1e-4,
        atol=1e-5,
    )


def test_thermo_sweep_streamed_matches_device():
    """The >HBM host-streaming tier must reproduce the device-resident
    sweep: same MC protocol (same keys, same shared noise), dataset
    visited in 3 uneven chunks, exact moment merge."""
    import jax

    from pdm_tpu.stats.sweep import thermo_sweep

    rng = np.random.RandomState(3)
    data = rng.standard_normal((130, 6)).astype(np.float32)
    temp = np.logspace(-2, 1, 9)

    device = thermo_sweep(
        jax.random.PRNGKey(0), jnp.asarray(data), temp, n_samples=64,
        batch_size=64,
    )
    streamed = thermo_sweep(
        jax.random.PRNGKey(0), data, temp, n_samples=64, batch_size=64,
        stream_chunk=48,
    )
    for key in ("entropy", "free_energy", "heat_capacity", "metric"):
        np.testing.assert_allclose(
            streamed[key], device[key], rtol=1e-4, atol=1e-5, err_msg=key
        )
    np.testing.assert_allclose(
        streamed["dataset_tr_sigma0"], device["dataset_tr_sigma0"],
        rtol=1e-5,
    )

    with pytest.raises(ValueError):
        thermo_sweep(
            jax.random.PRNGKey(0), data, temp, n_samples=8, batch_size=8,
            stream_chunk=48, adaptive_knn=True, regularize=True,
        )
