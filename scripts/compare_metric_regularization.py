"""Empirical metric with vs without manifold regularization + induced
schedules. Parity: reference scripts/compare_metric_regularization.py."""
import argparse

import numpy as np

from _common import ensure_dirs, setup_jax


def main() -> None:
    setup_jax()
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.stats.sweep import metric_stats
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="cifar10")
    parser.add_argument("--n_samples", type=int, default=512)
    args = parser.parse_args()

    config = load_config()
    config.dataset_name = args.dataset
    ensure_dirs("stats")
    data = get_data_tensor(config)
    temps = np.logspace(-4, 6, 100)

    print("Computing empirical metric stats (no regularization)...")
    stats_emp = metric_stats(jax.random.PRNGKey(0), data, temps,
                             n_samples=args.n_samples, batch_size=256)
    print("Computing empirical metric stats (with regularization)...")
    stats_reg = metric_stats(jax.random.PRNGKey(0), data, temps,
                             n_samples=args.n_samples, batch_size=256,
                             regularize=True)
    np.savez(config.metric_stats_path, **stats_reg)
    print(f"Saved regularized metric stats to {config.metric_stats_path}")

    def schedule(metric):
        sqrt_g = np.sqrt(np.clip(metric, 0, None))
        dr = 0.5 * (sqrt_g[1:] + sqrt_g[:-1]) * np.diff(np.log(temps))
        r = np.concatenate([[0], np.cumsum(dr)])
        return r / r[-1]

    plt.figure(figsize=(15, 6))
    plt.subplot(1, 2, 1)
    plt.loglog(temps, np.maximum(stats_emp["metric"], 1e-12), "r--", label="Empirical (Sparse)")
    plt.loglog(temps, np.maximum(stats_reg["metric"], 1e-12), "b-", label="Regularized")
    plt.xlabel("Temperature"); plt.ylabel("Metric G"); plt.legend()
    plt.grid(which="both", alpha=0.3)
    plt.subplot(1, 2, 2)
    plt.semilogy(schedule(stats_emp["metric"]), temps, "r--", label="Schedule (Sparse)")
    plt.semilogy(schedule(stats_reg["metric"]), temps, "b-", label="Schedule (Regularized)")
    plt.xlabel("tau"); plt.ylabel("Temperature"); plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig("metric_regularization_comparison.png")
    print("Saved metric_regularization_comparison.png")


if __name__ == "__main__":
    main()
