"""Nearest/2nd-nearest-neighbor distance statistics -> critical
temperature estimate. Parity: reference scripts/analyze_cifar_nn.py,
generalized to any dataset (on-device chunked kNN)."""
import argparse

import numpy as np

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.ops.knn import knn_sqdist
    from pdm_tpu.utils.data import get_data_tensor

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="cifar10")
    parser.add_argument("--n_analyze", type=int, default=5000)
    args = parser.parse_args()

    config = load_config()
    config.dataset_name = args.dataset
    data = get_data_tensor(config)
    x = data[: args.n_analyze]
    print(f"Analyzing distances for {x.shape[0]} {args.dataset} samples...")

    nn1 = np.asarray(knn_sqdist(x, k=1))
    nn2 = np.asarray(knn_sqdist(x, k=2))
    gap = nn2 - nn1
    print(f"NN dist_sq  - Mean: {nn1.mean():.4f}, Min: {nn1.min():.4f}, Max: {nn1.max():.4f}")
    print(f"NN2 dist_sq - Mean: {nn2.mean():.4f}")
    print(f"Gap dist_sq - Mean: {gap.mean():.4f}")
    print(f"Estimated Critical Temperature: {nn1.mean():.4f}")


if __name__ == "__main__":
    main()
