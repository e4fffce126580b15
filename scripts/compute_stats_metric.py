"""Empirical (data-space) Fisher-Rao metric sweep -> stats/{ds}_metric.npz.

Parity: the metric-estimation path of reference
scripts/compute_cifar10_metric.py, generalized to any dataset; flags for
manifold regularization (global floor / adaptive k-NN).
"""
import argparse

import numpy as np

from _common import ensure_dirs, setup_jax, temp_grid
from pdm_tpu.config.loader import load_config, parse_args_from_config, update_config_from_args


def main() -> None:
    setup_jax()
    import jax

    from pdm_tpu.parallel.mesh import mesh_from_config
    from pdm_tpu.stats.sweep import metric_stats
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--n_samples", type=int, default=2000)
    parser.add_argument("--n_temps", type=int, default=100)
    parser.add_argument("--regularize", action="store_true")
    parser.add_argument("--adaptive_knn", action="store_true")
    parser.add_argument("--knn_k", type=int, default=5)
    parser.add_argument("--sigma_reg_scale", type=float, default=1e-4)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument(
        "--stream_chunk", type=int, default=None,
        help="host-streaming tier for >HBM datasets: dataset stays in "
        "host RAM, swept in device chunks of this many points "
        "(single-device; incompatible with --adaptive_knn)",
    )
    args = parser.parse_args()

    config = load_config()
    if args.dataset:
        config.dataset_name = args.dataset
    ensure_dirs("stats")
    if args.stream_chunk is not None:
        from pdm_tpu.utils.data import get_data_array

        data = get_data_array(config)
        mesh = None
    else:
        data = get_data_tensor(config)
        mesh = mesh_from_config(config.parallel)
    temp = temp_grid(*config.dataset_config.temp_range, args.n_temps)
    stats = metric_stats(
        jax.random.PRNGKey(0), data, temp,
        n_samples=args.n_samples,
        batch_size=min(args.n_samples, 512),
        regularize=args.regularize,
        adaptive_knn=args.adaptive_knn,
        knn_k=args.knn_k,
        sigma_reg_scale=args.sigma_reg_scale,
        mesh=mesh,
        stream_chunk=args.stream_chunk,
    )
    np.savez(config.metric_stats_path, **stats)
    print(f"saved {config.metric_stats_path}")


if __name__ == "__main__":
    main()
