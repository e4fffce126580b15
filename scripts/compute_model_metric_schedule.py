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
    from pdm_tpu.schedulers.interpolated import metric_scheduler
    from pdm_tpu.stats.model_metric import model_metric_stats
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--n_steps", type=int, default=10)
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
    sched = metric_scheduler(stats["log_temp"], stats["metric"])
    import jax.numpy as jnp

    tau = jnp.linspace(0.0, 1.0, args.n_steps + 1)[1:]
    log_temp = np.asarray(sched.log_temp_from_tau(tau))
    out = args.out or config.metric_stats_path.replace(".npz", "_model_schedule.npz")
    np.savez(out, log_temp=log_temp, timestamps=np.asarray(tau))
    print(f"saved {out}: log_temp={log_temp}")


if __name__ == "__main__":
    main()
