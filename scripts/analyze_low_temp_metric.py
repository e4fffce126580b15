"""Low-temperature metric diagnostics: empirical G(lambda) vs the
asymptote (Delta^2/2T)^2 exp(-Delta^2/2T).
Parity: reference scripts/analyze_low_temp_metric.py (CIFAR-10 or any
dataset via --dataset; synthetic fallback offline)."""
import argparse

import numpy as np

from _common import ensure_dirs, setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.stats.sweep import metric_stats
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="cifar10")
    parser.add_argument("--delta_sq", type=float, default=28.0)
    parser.add_argument("--n_samples", type=int, default=512)
    args = parser.parse_args()

    config = load_config()
    config.dataset_name = args.dataset
    data = get_data_tensor(config)
    temps = np.logspace(-4, 1, 30)
    stats = metric_stats(jax.random.PRNGKey(0), data, temps,
                         n_samples=args.n_samples, batch_size=256)
    metric, temp = stats["metric"], stats["temp"]

    plt.figure(figsize=(10, 6))
    plt.loglog(temp, np.maximum(metric, 1e-12), "bo-", label="Empirical G(lambda)")
    theo = (args.delta_sq / (2 * temp)) ** 2 * np.exp(-args.delta_sq / (2 * temp))
    mask = temp < 1.0
    if mask.any() and theo[mask].max() > 0 and metric[mask].max() > 0:
        scale = metric[mask].max() / theo[mask].max()
        plt.loglog(temp, theo * scale, "r--",
                   label=f"Asymptote (Delta^2={args.delta_sq})")
    plt.xlabel("Temperature T"); plt.ylabel("Metric G(lambda)")
    plt.legend(); plt.grid(which="both", alpha=0.3)
    plt.savefig("low_temp_metric.png")
    print("Saved low_temp_metric.png")


if __name__ == "__main__":
    main()
