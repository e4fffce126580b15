"""MC metric estimator vs closed-form G(lambda) for a Gaussian prior
(lambda = log sigma^2). Parity: reference scripts/verify_logsnr_metric.py.
"""
import numpy as np

from _common import setup_jax


def analytical_metric_lambda(lam, sigma0=1.0):
    s2 = np.exp(lam)
    return 0.5 * sigma0**2 * (sigma0**2 + 2 * s2) / (sigma0**2 + s2) ** 2


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.stats.mc_metric import metric_scalar

    lambdas = np.linspace(-4, 4, 20)
    x = jax.random.normal(jax.random.PRNGKey(42), (10_000, 1))

    mc, ana = [], []
    for i, lam in enumerate(lambdas):
        mc.append(
            float(metric_scalar(jnp.asarray(lam), x, jax.random.PRNGKey(i), n_y=10_000))
        )
        ana.append(analytical_metric_lambda(lam))
        print(f"lambda: {lam:.4f}, Analytical: {ana[-1]:.4f}, MC: {mc[-1]:.4f}")

    plt.figure(figsize=(10, 6))
    plt.plot(lambdas, ana, "b-", label="Analytical")
    plt.plot(lambdas, mc, "ro", label="Monte Carlo Estimation")
    plt.xlabel("lambda = ln sigma^2"); plt.ylabel("Metric G(lambda)")
    plt.legend(); plt.grid(True, alpha=0.5)
    plt.savefig("metric_comparison_lambda.png")
    print("Plot saved to metric_comparison_lambda.png")


if __name__ == "__main__":
    main()
