"""Sample from a trained model -> samples/... .npz
(parity: reference scripts/sample.py)."""
import numpy as np

from _common import ensure_dirs, setup_jax
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


def build_sampler(config: Config, ddpm=None, min_temp=None):
    """Sampler from config (parity: DDPMSampler.from_config,
    ddpm_sampling.py:57-87): sampling schedule independent of the training
    schedule; custom schedules pass their own knot grid."""
    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.schedulers.from_config import scheduler_from_config
    from pdm_tpu.schedulers.interpolated import InterpolatedScheduler

    if min_temp is not None:
        config.entropy_schedule.min_temp = min_temp
    if ddpm is None:
        ddpm = ddpm_from_config(config, pretrained=True)
    scheduler = scheduler_from_config(
        config,
        noise_schedule_type=config.sample.noise_schedule_type,
        noise_schedule_path=config.sample.noise_schedule_path,
    )
    log_temp = None
    if config.sample.noise_schedule_type == "custom" and isinstance(
        scheduler, InterpolatedScheduler
    ):
        log_temp = scheduler.log_temp
    sampler = DDPMSampler(
        ddpm=ddpm,
        scheduler=scheduler,
        n_steps=config.sample.n_steps,
        obj_size=config.dataset_config.obj_size,
        batch_size=config.sample.batch_size,
        n_samples=config.sample.n_samples,
        step_type=config.sample.step_type,
        precision="half" if config.sample.precision == "half" else "full",
        track_states=config.sample.track_states,
        log_temp=log_temp,
    )
    # data-parallel sampling over all visible devices when >1
    import jax

    if len(jax.devices()) > 1:
        from pdm_tpu.parallel.distributed import sharded_sampler
        from pdm_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        model_ax = max(1, config.parallel.model_axis)
        if n % model_ax == 0:
            # model_axis>1 + model_partition=spatial shards the image H
            # axis over 'model' (halo-exchange convs) on top of DP batch
            partition = (
                "spatial"
                if model_ax > 1
                and config.parallel.model_partition == "spatial"
                else "data"
            )
            sampler = sharded_sampler(
                sampler, make_mesh(model=model_ax), partition=partition
            )
    return sampler


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    ensure_dirs("samples")
    sampler = build_sampler(config)
    samples = sampler.sample()
    np.savez(config.samples_path, **samples)
    print(f"saved {config.samples_path} x.shape={samples['x'].shape}")


if __name__ == "__main__":
    main()
