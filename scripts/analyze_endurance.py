"""Plot the endurance run's training trajectory and eval history.

Reads logs/endurance.csv (CSVLogger long format) + endurance_result.json
and writes endurance_curves.png: loss (log-log), learning-rate tail, FID
vs step, and gradient norm — the long-horizon trainer evidence (EMA
horizon, warmup/decay tail, crash-resume continuity) in one figure.
"""

import argparse
import json

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default="logs/endurance.csv")
    parser.add_argument("--result", default="endurance_result.json")
    parser.add_argument("--out", default="endurance_curves.png")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series: dict = {}
    with open(args.csv) as f:
        next(f)
        for line in f:
            step, metric, value, _t = line.rstrip("\n").split(",")
            series.setdefault(metric, []).append((int(step), float(value)))

    fig, axes = plt.subplots(1, 4, figsize=(18, 4))
    for ax, key, yscale in (
        (axes[0], "loss", "log"),
        (axes[1], "learning_rate", "linear"),
        (axes[2], "fid", "log"),
        (axes[3], "grad_norm", "log"),
    ):
        pts = sorted(series.get(key, []))
        if not pts:
            continue
        s, v = np.array(pts).T
        ax.plot(s, v, ".-" if len(pts) < 50 else "-", ms=4, lw=1)
        ax.set(title=key, xlabel="step", yscale=yscale)
        ax.grid(alpha=0.3)

    try:
        with open(args.result) as f:
            res = json.load(f)
        fig.suptitle(
            f"endurance: {res['steps']} steps, resumed from "
            f"{res['resumed_from']}, final FID {res['final_fid']:.2f} "
            f"(floor {res['fid_floor']:.2f}), "
            f"{res['img_per_sec']:.0f} img/s"
        )
    except Exception:
        pass
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
