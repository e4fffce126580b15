"""Schedule-shape comparison + FID sweep overlay (the reference's
compare_schedules.ipynb as a CLI)."""
import argparse
import glob
import os

import numpy as np

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.schedulers.analytic import (
        CosineScheduler, LinearBetaScheduler, LogSNRScheduler,
    )
    from pdm_tpu.schedulers.interpolated import (
        entropy_scheduler_from_npz, metric_scheduler_from_npz,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--fid_dir", default="fid")
    args = parser.parse_args()

    config = load_config()
    scheds = {
        "linear_beta": LinearBetaScheduler(*config.diffusion.temp_range),
        "cosine": CosineScheduler(*config.diffusion.temp_range),
        "log_snr": LogSNRScheduler(*config.diffusion.temp_range),
    }
    if os.path.exists(config.forward_stats_path):
        scheds["entropy"] = entropy_scheduler_from_npz(
            config.forward_stats_path,
            extrapolate=config.entropy_schedule.extrapolate,
            min_temp=config.entropy_schedule.min_temp,
            max_temp=config.entropy_schedule.max_temp,
        )
    if os.path.exists(config.metric_stats_path):
        scheds["metric"] = metric_scheduler_from_npz(config.metric_stats_path)

    tau = jnp.linspace(0, 1, 200)
    plt.figure(figsize=(8, 5))
    for name, s in scheds.items():
        plt.plot(np.asarray(tau), np.asarray(s.log_temp_from_tau(tau)), label=name)
    plt.xlabel("tau")
    plt.ylabel("log T")
    plt.title("Noise schedules in log-temperature space")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig("schedules.png")
    print("saved schedules.png")

    csvs = sorted(glob.glob(f"{args.fid_dir}/*.csv"))
    if csvs:
        import pandas as pd

        plt.figure(figsize=(8, 5))
        for path in csvs:
            df = pd.read_csv(path)
            for sched_name, grp in df.groupby("schedule"):
                g = grp.groupby("n_steps")["fid"].min()
                plt.plot(g.index, g.values, "o-",
                         label=f"{os.path.basename(path)}:{sched_name}")
        plt.xlabel("sampling steps")
        plt.ylabel("FID")
        plt.legend(fontsize=7)
        plt.grid(alpha=0.3)
        plt.savefig("fid_vs_steps.png")
        print("saved fid_vs_steps.png")


if __name__ == "__main__":
    main()
