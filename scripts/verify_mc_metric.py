"""MC metric estimator vs the closed-form Gaussian metric
G(sigma) = 2 s0^2 (s0^2 + 2 s^2) / (s^2 (s0^2 + s^2)^2).

Parity: reference scripts/verify_mc_metric.py (sigma parameterization;
the MC estimate here converts from the streaming lambda-estimator via
G(sigma) = G(lambda) * (2/sigma)^2 since lambda = log sigma^2).
"""
import numpy as np

from _common import setup_jax


def analytical_metric(sigma, sigma0=1.0):
    return (
        2 * sigma0**2 * (sigma0**2 + 2 * sigma**2)
        / (sigma**2 * (sigma0**2 + sigma**2) ** 2)
    )


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.stats.mc_metric import metric_scalar

    sigma0 = 1.0
    sigmas = np.logspace(-1, 1, 20)
    x = jax.random.normal(jax.random.PRNGKey(42), (10_000, 1)) * sigma0

    mc, ana = [], []
    for i, s in enumerate(sigmas):
        lam = float(np.log(s**2))
        g_lambda = float(
            metric_scalar(jnp.asarray(lam), x, jax.random.PRNGKey(i), n_y=10_000)
        )
        g_sigma = g_lambda * (2.0 / s) ** 2  # d lambda / d sigma = 2 / sigma
        mc.append(g_sigma)
        ana.append(analytical_metric(s, sigma0))
        print(f"sigma: {s:.4f}, Analytical: {ana[-1]:.4f}, MC: {mc[-1]:.4f}")

    plt.figure(figsize=(10, 6))
    plt.loglog(sigmas, ana, "b-", label="Analytical")
    plt.loglog(sigmas, mc, "ro", label="Monte Carlo Estimation")
    plt.xlabel("sigma"); plt.ylabel("Metric G(sigma)")
    plt.legend(); plt.grid(True, which="both", alpha=0.5)
    plt.savefig("metric_comparison.png")
    print("Plot saved to metric_comparison.png")


if __name__ == "__main__":
    main()
