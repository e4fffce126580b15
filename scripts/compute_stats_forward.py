"""Forward free-energy/entropy sweep -> stats/{ds}_forward.npz.

Parity: reference scripts/compute_stats_forward.py (log-spaced temperature
grid over the dataset's temp range, MC-averaged entropy estimator).
"""
import numpy as np

from _common import ensure_dirs, setup_jax, temp_grid
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    import jax

    from pdm_tpu.parallel.mesh import mesh_from_config
    from pdm_tpu.stats.sweep import forward_stats
    from pdm_tpu.utils.data import get_data_array, get_data_tensor

    ensure_dirs("stats")
    stream_chunk = config.forward_stats.stream_chunk
    mesh = None
    if stream_chunk is None:
        mesh = mesh_from_config(
            config.parallel, batch_size=config.forward_stats.batch_size
        )
    for dataset_name in config.available_datasets:
        print(dataset_name)
        config.dataset_name = dataset_name
        # stream_chunk: the dataset stays in host RAM and sweeps through
        # device-resident chunks (>HBM tier); otherwise device-resident
        data = (
            get_data_array(config) if stream_chunk is not None
            else get_data_tensor(config)
        )
        temp = temp_grid(*config.dataset_config.temp_range,
                         config.forward_stats.n_temps)
        stats = forward_stats(
            jax.random.PRNGKey(0), data, temp,
            n_samples=config.forward_stats.n_samples,
            batch_size=config.forward_stats.batch_size,
            mesh=mesh,
            stream_chunk=stream_chunk,
        )
        np.savez(config.forward_stats_path, **stats)
        print(f"saved {config.forward_stats_path}")


if __name__ == "__main__":
    main()
