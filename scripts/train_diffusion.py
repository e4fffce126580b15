"""Train the configured DDPM (parity: reference scripts/train_diffusion.py,
with the latent DDPM.from_config bug fixed by construction)."""
import os

from _common import ensure_dirs, setup_jax
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    import jax

    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.parallel.mesh import mesh_from_config
    from pdm_tpu.utils.data import get_data_tensor
    from pdm_tpu.utils.logging import CSVLogger, make_eval_fn

    ensure_dirs(config.checkpoint_dir, "logs")
    mesh = mesh_from_config(
        config.parallel,
        batch_size=config.ddpm_training.batch_size,
        grad_accum=config.ddpm_training.grad_accum,
    )
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)}")
    data = get_data_tensor(config)
    ddpm = ddpm_from_config(config)
    tc = config.ddpm_training
    logger = CSVLogger(
        f"logs/{config.experiment_name}.csv",
        use_wandb=tc.use_wandb,
        run_name=config.experiment_name,
    )
    trainer = DDPMTrainer(
        ddpm=ddpm,
        learning_rate=tc.learning_rate,
        weight_decay=tc.weight_decay,
        betas=tc.betas,
        warmup_steps=tc.warmup_steps,
        total_iters=tc.total_iters,
        grad_clip=tc.grad_clip,
        ema_decay=tc.ema_decay,
        eval_steps=tc.eval_steps,
        keep_checkpoints=tc.keep_checkpoints,
        checkpoint_dir=config.checkpoint_dir,
        eval_fn=make_eval_fn(config, data, logger=logger),
        log_fn=logger,
        horizontal_flip=(
            config.data_augmentation.use_augmentation
            and config.data_augmentation.horizontal_flip
        ),
        model_partition=config.parallel.model_partition,
        fsdp=config.parallel.fsdp,
        grad_accum=tc.grad_accum,
        data_layout=tc.data_layout,
    )
    if tc.data_layout == "nhwc" and data.ndim == 4:
        # store the device-resident dataset conv-native; the eval hook
        # above already captured its NCHW reference features, so this is
        # the only copy training keeps. Non-image (flat) datasets have
        # no layout axis — the trainer ignores data_layout for them.
        data = data.transpose(0, 2, 3, 1)
    trainer.train(
        data, batch_size=tc.batch_size, total_iters=tc.total_iters, mesh=mesh
    )


if __name__ == "__main__":
    main()
