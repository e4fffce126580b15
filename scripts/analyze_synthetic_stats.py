"""Hypersphere thermodynamics: MC estimator vs the exact Bessel closed
forms, across dataset sizes N (the reference's analyze_synthetic_stats +
hypersphere notebooks as one CLI)."""
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

    from pdm_tpu.stats.hypersphere import marginal_stats
    from pdm_tpu.stats.sweep import thermo_sweep
    from pdm_tpu.utils.synthetic import sample_on_hypersphere

    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=10)
    parser.add_argument("--sizes", type=int, nargs="+", default=[100, 1000, 10_000])
    parser.add_argument("--n_samples", type=int, default=512)
    args = parser.parse_args()

    temps = np.logspace(-2.5, 2, 40)
    oracle = marginal_stats(temps, d=args.d)

    plt.figure(figsize=(12, 4))
    for i, key in enumerate(["S", "C"], 1):
        plt.subplot(1, 2, i)
        plt.plot(temps, oracle[key], "k-", linewidth=2, label="exact (Bessel)")
        for n in args.sizes:
            data = sample_on_hypersphere(args.d, n=n, radius=1.0, seed=0)
            out = thermo_sweep(
                jax.random.PRNGKey(0), jnp.asarray(data), temps,
                n_samples=args.n_samples, batch_size=args.n_samples,
            )
            vals = out["entropy"] if key == "S" else out["heat_capacity"]
            plt.plot(temps, vals, "--", label=f"MC N={n}")
        plt.xscale("log")
        plt.title(f"{key}(T), d={args.d}")
        plt.xlabel("Temperature")
        plt.grid(alpha=0.3)
        plt.legend(fontsize=8)
    plt.tight_layout()
    plt.savefig("hypersphere_stats.png")
    print("saved hypersphere_stats.png")
    # numeric check at mid temperatures
    data = sample_on_hypersphere(args.d, n=max(args.sizes), radius=1.0, seed=0)
    out = thermo_sweep(jax.random.PRNGKey(1), jnp.asarray(data), temps,
                       n_samples=args.n_samples, batch_size=args.n_samples)
    mid = slice(10, 30)
    err = np.abs(out["entropy"][mid] - oracle["S"][mid]).max()
    print(f"max |S_mc - S_exact| (mid range, N={max(args.sizes)}): {err:.4f}")


if __name__ == "__main__":
    main()
