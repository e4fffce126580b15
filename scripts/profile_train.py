"""Profiling demo: run N train steps under the PhaseTimer and (optionally)
a jax.profiler device trace -> TensorBoard logdir.

Usage: python profile_train.py [--steps 30] [--trace]
The tracing/profiling subsystem the reference lacked (SURVEY §5).
"""
import argparse
import contextlib

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.config.loader import load_config
    from pdm_tpu.utils.profiling import PhaseTimer, trace

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--trace", action="store_true")
    parser.add_argument("--trace_dir", default="profile_trace")
    args = parser.parse_args()

    config = load_config()
    ddpm = ddpm_from_config(config)
    tc = config.ddpm_training
    timer = PhaseTimer()
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=tc.learning_rate, weight_decay=tc.weight_decay,
        betas=tc.betas, warmup_steps=tc.warmup_steps, total_iters=tc.total_iters,
        grad_clip=tc.grad_clip, ema_decay=tc.ema_decay, eval_steps=10**9,
        timer=timer,
    )
    shape = (max(args.batch_size * 4, 512), *config.dataset_config.obj_size)
    data = jnp.asarray(
        np.random.RandomState(0).standard_normal(shape).astype(np.float32)
    )

    # warm up compile outside the trace
    trainer.train(data, batch_size=args.batch_size, total_iters=1)

    ctx = trace(args.trace_dir) if args.trace else contextlib.nullcontext()
    with ctx:
        trainer.train(data, batch_size=args.batch_size, total_iters=args.steps)
    print(timer.report())
    if args.trace:
        print(f"device trace written to {args.trace_dir}/ (TensorBoard-compatible)")


if __name__ == "__main__":
    main()
