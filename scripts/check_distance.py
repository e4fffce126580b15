"""Diagnose how the Fisher-Rao arc length distributes over temperature.

Loads a metric-stats artifact (stats/{ds}_metric.npz) and reports what
fraction of the total geodesic distance is accumulated below a probe
temperature — the sanity check behind the geodesic schedule: if most of the
arc length sits below T~1e-2 the sampler must spend most of its steps there.

Capability parity with reference scripts/check_distance.py (rebuilt on the
shared ``fisher_rao_arc_length`` helper the geodesic scheduler uses).
"""
import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--stats_path", default="stats/cifar10_metric.npz",
        help="metric-stats npz (keys: temp, metric, log_temp)",
    )
    parser.add_argument(
        "--probe_temp", type=float, default=1e-2,
        help="temperature at which to report the distance fraction",
    )
    parser.add_argument("--out", default="debug_distance.png")
    args = parser.parse_args()

    from pdm_tpu.schedulers.interpolated import fisher_rao_arc_length

    stats = np.load(args.stats_path)
    log_temp, r = fisher_rao_arc_length(stats["log_temp"], stats["metric"])
    temp = np.exp(log_temp)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.semilogx(temp, r / r[-1])
    ax.axvline(args.probe_temp, ls=":", color="gray")
    ax.set(xlabel="temperature", ylabel="fraction of total FR distance",
           title="cumulative Fisher-Rao arc length")
    fig.savefig(args.out, dpi=120)

    i = int(np.searchsorted(temp, args.probe_temp))
    i = min(i, len(temp) - 1)
    frac = r[i] / r[-1] if r[-1] > 0 else float("nan")
    print(f"total arc length: {r[-1]:.4f}")
    print(
        f"fraction accumulated below T={args.probe_temp:g}: {frac:.4f} "
        f"(r={r[i]:.4f})"
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
