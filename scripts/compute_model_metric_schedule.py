"""Model-based metric -> CustomScheduler-compatible npz
(parity: reference scripts/compute_model_metric_schedule.py)."""
import argparse

import numpy as np

from _common import ensure_dirs, setup_jax, temp_grid


def main() -> None:
    setup_jax()
    import jax

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.stats.model_metric import model_metric_stats
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--n_samples", type=int, default=2048)
    parser.add_argument("--n_temps", type=int, default=100)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    config = load_config()
    ensure_dirs("stats")
    data = get_data_tensor(config)
    ddpm = ddpm_from_config(config, pretrained=True)
    temp = temp_grid(config.diffusion.min_temp, config.diffusion.max_temp,
                     args.n_temps)
    stats = model_metric_stats(jax.random.PRNGKey(0), ddpm, data, temp,
                               n_samples=args.n_samples)
    # stats artifact (reference {ds}_metric_model.npz contract)
    stats_out = config.metric_stats_path.replace(".npz", "_model.npz")
    np.savez(stats_out, **stats)
    print(f"saved {stats_out}")

    # DENSE CustomScheduler table over the full measured grid, timestamps
    # from 0 (reference compute_model_metric_schedule.py:110-130) — a
    # sparse knot set starting at tau=1/n would make the sampler
    # extrapolate below the first knot for any finer n_steps
    from pdm_tpu.schedulers.interpolated import fisher_rao_arc_length

    log_temp, r = fisher_rao_arc_length(stats["log_temp"], stats["metric"])
    if r[-1] <= 0:
        raise RuntimeError("integrated Fisher-Rao distance is non-positive")
    out = args.out or config.metric_stats_path.replace(
        ".npz", "_model_schedule.npz"
    )
    np.savez(out, log_temp=log_temp, timestamps=r / r[-1])
    print(f"saved {out}: {len(log_temp)}-knot dense schedule")


if __name__ == "__main__":
    main()
