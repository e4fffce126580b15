"""Free energy / entropy / heat capacity plots from a forward-stats npz
(the reference's analyze_stats.ipynb as a CLI)."""
import argparse

import numpy as np


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser()
    parser.add_argument("--stats_path", default="stats/cifar10_forward.npz")
    parser.add_argument("--out", default="stats_analysis.png")
    args = parser.parse_args()

    stats = np.load(args.stats_path)
    temp = stats["temp"]
    entropy = stats["entropy"]

    panels = [("Entropy S(T)", entropy, "linear")]
    if "free_energy" in stats:
        panels.insert(0, ("Free energy F(T)", stats["free_energy"], "linear"))
    if "heat_capacity" in stats:
        panels.append(("Heat capacity C(T)", stats["heat_capacity"], "log"))
    else:
        # C = dS/dlogT numerically
        c = np.gradient(entropy, np.log(temp))
        panels.append(("Heat capacity dS/dlogT", c, "log"))

    plt.figure(figsize=(5 * len(panels), 4))
    for i, (title, vals, yscale) in enumerate(panels, 1):
        plt.subplot(1, len(panels), i)
        plt.plot(temp, vals)
        plt.xscale("log")
        if yscale == "log" and np.all(np.asarray(vals) > 0):
            plt.yscale("log")
        plt.title(title)
        plt.xlabel("Temperature")
        plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
