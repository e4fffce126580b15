"""Fully-offline end-to-end pipeline demo: train a UNet DDPM on a
synthetic structured image distribution, sample with several schedules,
and evaluate FID with a locally-trained LeNet feature extractor.

This exercises the complete production path (data -> trainer w/ EMA +
checkpoints -> sampler -> FID) without any external datasets or weights —
the integration test for the whole framework on real TPU hardware.

Dataset: "blobs" — each image contains k in {1..4} Gaussian bumps at
random positions; class label = k (gives the LeNet a real task, and the
generative model a multi-modal, structured target).
"""

import argparse
import os
import time

import numpy as np

from _common import ensure_dirs, setup_jax


def make_blob_dataset(n, size=16, seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size]
    k = rng.randint(1, 5, n)
    imgs = np.zeros((n, size, size), np.float32)
    for i in range(n):
        for _ in range(k[i]):
            cy, cx = rng.uniform(2, size - 2, 2)
            s = rng.uniform(1.0, 2.0)
            imgs[i] += np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    imgs = np.clip(imgs, 0, 1) * 2.0 - 1.0
    return imgs[:, None, :, :], (k - 1).astype(np.int32)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--n_data", type=int, default=20_000)
    parser.add_argument("--size", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--fid_samples", type=int, default=5000)
    parser.add_argument("--sample_steps", type=int, nargs="+", default=[10, 50])
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.lenet import train_lenet
    from pdm_tpu.models.unet import UNet2D
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import CosineScheduler, LinearBetaScheduler
    from pdm_tpu.stats.sweep import forward_stats
    from pdm_tpu.schedulers.interpolated import entropy_scheduler
    from pdm_tpu.utils.fid import get_compute_fid
    from pdm_tpu.utils.profiling import PhaseTimer
    from pdm_tpu.utils.timing import sync

    print("1/6 dataset...")
    imgs, labels = make_blob_dataset(args.n_data, args.size)
    data = jnp.asarray(imgs)

    print("2/6 LeNet feature extractor (blob-count classification)...")
    model, lenet_params = train_lenet(
        jax.random.PRNGKey(0), data, jnp.asarray(labels),
        batch_size=256, epochs=3, verbose=True,
    )

    @jax.jit
    def feature_fn(x):
        return model.apply({"params": lenet_params}, x, features_only=True)

    compute_fid = get_compute_fid(data, feature_fn, 100)

    print("3/6 forward entropy sweep -> entropy schedule...")
    temps = np.logspace(-3, 3, 24)
    stats = forward_stats(
        jax.random.PRNGKey(1), data, temps, n_samples=512, batch_size=512
    )
    ent_sched = entropy_scheduler(
        stats["temp"], stats["entropy"], extrapolate=True, min_temp=1e-3
    )

    print("4/6 train UNet DDPM...")
    train_sched = LinearBetaScheduler(1e-3, 1e3)
    net = UNet2D(
        in_channels=1, out_channels=1,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2, attention_head_dim=32, norm_groups=8,
        dropout=0.1, dtype=jnp.bfloat16,
    )
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(2), train_sched, net, (1, args.size, args.size),
        parametrization="eps",
    )
    timer = PhaseTimer()
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=3e-4, warmup_steps=200,
        total_iters=args.steps, grad_clip=1.0, ema_decay=0.999,
        eval_steps=10**9, timer=timer,
        log_fn=lambda step, m: print(f"  step {step}: {m}"),
    )
    t0 = time.time()
    state = trainer.train(
        data, batch_size=args.batch_size, total_iters=args.steps,
        log_every=max(1, args.steps // 5),
    )
    print(f"  trained {args.steps} steps in {time.time() - t0:.1f}s")
    print(timer.report())

    ema_ddpm = ddpm.with_params(state.ema_params)

    print("5/6 sample + FID across schedules / step counts...")
    results = []
    for sched_name, sched in [
        ("linear_beta", train_sched),
        ("cosine", CosineScheduler(1e-3, 1e3)),
        ("entropy", ent_sched),
    ]:
        for n_steps in args.sample_steps:
            sampler = DDPMSampler(
                ddpm=ema_ddpm, scheduler=sched, n_steps=n_steps,
                obj_size=(1, args.size, args.size),
                batch_size=min(2500, args.fid_samples),
                n_samples=args.fid_samples, step_type="ddpm",
            )
            t0 = time.time()
            samples = sampler.sample(jax.random.PRNGKey(3))["x"]
            dt = time.time() - t0
            fid = compute_fid(jnp.asarray(samples))
            results.append((sched_name, n_steps, fid, args.fid_samples / dt))
            print(
                f"  {sched_name:>12} @ {n_steps:3d} steps: "
                f"FID={fid:8.3f}  ({args.fid_samples/dt:,.0f} samples/s)"
            )

    print("6/6 sanity: FID floor (train vs train-half split)")
    floor = compute_fid(data[: args.fid_samples])
    print(f"  train-subset FID floor: {floor:.3f}")
    best = min(r[2] for r in results)
    print(f"RESULT best_fid={best:.3f} floor={floor:.3f}")


if __name__ == "__main__":
    main()
