"""FID comparison of linear/cosine/metric schedules at low step counts
(parity: reference scripts/cifar10_metric_exp.py, dataset-generic)."""
import argparse

import numpy as np

from _common import ensure_dirs, setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.schedulers.analytic import CosineScheduler, LinearBetaScheduler
    from pdm_tpu.schedulers.interpolated import metric_scheduler_from_npz
    from pdm_tpu.utils.data import get_data_tensor
    from pdm_tpu.utils.fid import get_compute_fid, get_feature_fn

    parser = argparse.ArgumentParser()
    parser.add_argument("--n_steps", type=int, default=10)
    parser.add_argument("--n_samples", type=int, default=50_000)
    args = parser.parse_args()

    config = load_config()
    ensure_dirs("fid")
    data = get_data_tensor(config)
    feature_fn, fdim = get_feature_fn(config.dataset_name)
    compute_fid = get_compute_fid(data, feature_fn, fdim)
    ddpm = ddpm_from_config(config, pretrained=True)

    import os

    if not os.path.exists(config.metric_stats_path):
        # reference cifar10_metric_exp.py computes the metric stats itself
        # when the artifact is absent — keep that UX rather than crashing
        print(f"{config.metric_stats_path} missing; computing metric stats")
        from _common import temp_grid
        from pdm_tpu.stats.sweep import metric_stats

        temps = temp_grid(*config.dataset_config.temp_range, 100)
        stats = metric_stats(
            jax.random.PRNGKey(1), data, temps, n_samples=512,
            batch_size=512, regularize=True,
        )
        np.savez(config.metric_stats_path, **stats)

    schedulers = {
        "linear_beta": LinearBetaScheduler(*config.diffusion.temp_range),
        "cosine": CosineScheduler(*config.diffusion.temp_range),
        "metric": metric_scheduler_from_npz(config.metric_stats_path),
    }
    for name, sched in schedulers.items():
        # DDIM steps: the reference experiment (cifar10_metric_exp.py)
        # measures its FID table with step_type="ddim"
        sampler = DDPMSampler(
            ddpm=ddpm, scheduler=sched, n_steps=args.n_steps,
            obj_size=config.dataset_config.obj_size,
            batch_size=500, n_samples=args.n_samples, step_type="ddim",
        )
        samples = sampler.sample(jax.random.PRNGKey(0))["x"]
        fid = compute_fid(jnp.asarray(samples))
        print(f"{name}: FID@{args.n_steps} steps = {fid:.3f}")


if __name__ == "__main__":
    main()
