"""MC rescaled-metric estimator vs closed form
G_tilde(sigma^2) = 2 s0^2 / (s0^2 + sigma^2)^2.
Parity: reference scripts/verify_rescaled_metric.py.
"""
import numpy as np

from _common import setup_jax


def analytical_rescaled(s2, sigma0_sq=1.0):
    return 2 * sigma0_sq / (sigma0_sq + s2) ** 2


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.stats.mc_metric import rescaled_metric_diag

    sigma_sqs = np.logspace(-2, 2, 20)
    x = jax.random.normal(jax.random.PRNGKey(42), (10_000, 1))

    mc, ana = [], []
    for i, s2 in enumerate(sigma_sqs):
        mc.append(
            float(
                rescaled_metric_diag(
                    jnp.asarray([s2], jnp.float32), x, jax.random.PRNGKey(i),
                    n_y=10_000,
                )[0]
            )
        )
        ana.append(analytical_rescaled(s2))
        print(f"sigma_sq: {s2:.4f}, Analytical: {ana[-1]:.4f}, MC: {mc[-1]:.4f}")

    plt.figure(figsize=(10, 6))
    plt.loglog(sigma_sqs, ana, "b-", label="Analytical")
    plt.loglog(sigma_sqs, mc, "ro", label="Monte Carlo Estimation")
    plt.xlabel("sigma^2"); plt.ylabel("Rescaled Metric")
    plt.legend(); plt.grid(True, which="both", alpha=0.5)
    plt.savefig("rescaled_metric_comparison.png")
    print("Plot saved to rescaled_metric_comparison.png")


if __name__ == "__main__":
    main()
