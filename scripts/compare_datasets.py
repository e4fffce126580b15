"""Entropy / heat-capacity comparison across datasets and subset sizes
(the reference's compare_datasets.ipynb as a CLI). Fully offline with
synthetic datasets; image datasets when cached."""
import argparse

import numpy as np

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.stats.sweep import thermo_sweep
    from pdm_tpu.utils.synthetic import (
        generate_gaussian, sample_on_hypersphere,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=32)
    parser.add_argument(
        "--subset_sizes", type=int, nargs="+", default=[1000, 10_000, 100_000]
    )
    parser.add_argument("--n_samples", type=int, default=256)
    args = parser.parse_args()

    temps = np.logspace(-3, 3, 40)
    datasets = {
        "gaussian": generate_gaussian(args.d, n=max(args.subset_sizes), seed=0),
        "hypersphere": sample_on_hypersphere(
            args.d, n=max(args.subset_sizes), radius=1.0, seed=0
        ),
    }

    plt.figure(figsize=(12, 5))
    for i, metric in enumerate(["entropy", "heat_capacity"], 1):
        plt.subplot(1, 2, i)
        for name, data in datasets.items():
            for n_sub in args.subset_sizes:
                out = thermo_sweep(
                    jax.random.PRNGKey(0), jnp.asarray(data[:n_sub]), temps,
                    n_samples=args.n_samples, batch_size=args.n_samples,
                )
                plt.plot(temps, out[metric], label=f"{name} N={n_sub}")
        plt.xscale("log")
        plt.title(metric)
        plt.xlabel("Temperature")
        plt.grid(alpha=0.3)
        plt.legend(fontsize=7)
    plt.tight_layout()
    plt.savefig("compare_datasets.png")
    print("saved compare_datasets.png")


if __name__ == "__main__":
    main()
