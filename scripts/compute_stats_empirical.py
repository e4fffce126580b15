"""Model-based dS/dlogT sweep + integrated entropy ->
stats/{exp}_empirical.npz (keys temp / entropy / rescaled_entropy /
d_entropy_d_log_temp, anchored to 0 at max temperature).

Parity: reference scripts/compute_stats_empirical.py.
"""
import numpy as np

from _common import ensure_dirs, setup_jax, temp_grid
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    import jax

    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.stats.model_metric import empirical_entropy_stats
    from pdm_tpu.utils.data import get_data_tensor

    ensure_dirs("stats")
    for dataset_name in config.available_datasets:
        print(dataset_name)
        config.dataset_name = dataset_name
        data = get_data_tensor(config)
        ddpm = ddpm_from_config(config, pretrained=True)
        es = config.empirical_stats
        temp = temp_grid(
            es.min_temp if es.min_temp is not None else config.diffusion.min_temp,
            es.max_temp if es.max_temp is not None else config.diffusion.max_temp,
            es.n_temps,
        )
        out = empirical_entropy_stats(
            jax.random.PRNGKey(0), ddpm, data, temp,
            n_samples=config.empirical_stats.batch_size
            * config.empirical_stats.n_steps_per_temp,
            batch_size=config.empirical_stats.batch_size,
        )
        np.savez(
            config.empirical_stats_path,
            temp=out["temp"], entropy=out["entropy"],
            rescaled_entropy=out["rescaled_entropy"],
            d_entropy_d_log_temp=out["d_entropy_d_log_temp"],
        )
        print(f"saved {config.empirical_stats_path}")


if __name__ == "__main__":
    main()
