"""Differentiable schedule optimization THROUGH the flagship UNet sampler.

Beyond the reference (which optimizes knots only with the analytic
1-D-GMM model, scripts/optimize_schedule.py): here the gradient flows
through the full reverse-process ``lax.scan`` of the trained 47M-param
UNet from the endurance run, optimizing an n-step log-temperature knot
vector against multi-scale RBF MMD in the LeNet FEATURE space (the same
features FID uses), then evaluating FID of the optimized schedule against
the analytic/data-driven schedules from endurance_schedule_table.md.

Run after longrun_endurance.py (needs checkpoints/endurance).
"""

import argparse
import json
import time

import numpy as np

from _common import setup_jax
from longrun_endurance import make_rgb_blob_dataset


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", default="checkpoints/endurance")
    parser.add_argument("--n_steps", type=int, default=5)
    parser.add_argument("--n_iters", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--learning_rate", type=float, default=0.05)
    parser.add_argument("--n_data", type=int, default=50_000)
    parser.add_argument("--fid_samples", type=int, default=5_000)
    parser.add_argument("--step_type", default="ddpm",
                        choices=["ddpm", "ddim", "heun", "dpmpp_2m"])
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    if args.out is None:
        suffix = "" if args.step_type == "ddpm" else f"_{args.step_type}"
        args.out = "optimized_flagship_schedule" + suffix

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.diffusion.sampling import discretize_schedule
    from pdm_tpu.diffusion.schedule_opt import (
        optimize_schedule, sample_with_grid,
    )
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.lenet import train_lenet
    from pdm_tpu.models.unet import unet_from_config
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler
    from pdm_tpu.utils.fid import get_compute_fid

    print("1/4 data + LeNet features (endurance seeds)...", flush=True)
    imgs, labels = make_rgb_blob_dataset(args.n_data)
    data = jnp.asarray(imgs)
    model, lenet_params = train_lenet(
        jax.random.PRNGKey(0), data, jnp.asarray(labels),
        batch_size=256, epochs=3, verbose=False,
    )

    def feature_fn(x):
        return model.apply({"params": lenet_params}, x, features_only=True)

    compute_fid = get_compute_fid(data, jax.jit(feature_fn), 100)

    print("2/4 endurance checkpoint...", flush=True)
    sched = LinearBetaScheduler(1e-4, 2.478e4)
    cfg = {
        "freq_shift": 1, "flip_sin_to_cos": False,
        "down_block_types": [
            "DownBlock2D", "AttnDownBlock2D", "DownBlock2D", "DownBlock2D"
        ],
        "up_block_types": [
            "UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D"
        ],
        "block_out_channels": [128, 256, 256, 256],
        "downsample_padding": 0, "attention_head_dim": 64,
        "dropout": 0.2, "norm_eps": 1e-6, "layers_per_block": 3,
    }
    net = unet_from_config(3, cfg, dtype=jnp.bfloat16)
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(2), sched, net, (3, 32, 32), parametrization="eps"
    )
    trainer = DDPMTrainer(ddpm=ddpm, checkpoint_dir=args.ckpt_dir)
    step = trainer.latest_checkpoint_step()
    if step is None:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}")
    state = trainer.load_checkpoint(trainer.init_state(), step)
    ema_ddpm = ddpm.with_params(state.ema_params)
    print(f"  loaded step {step}", flush=True)

    print(f"3/4 optimize {args.n_steps}-knot schedule "
          f"({args.n_iters} iters, feature-space MMD)...", flush=True)
    init = discretize_schedule(sched, args.n_steps)
    t0 = time.time()
    out = optimize_schedule(
        ema_ddpm, data, init,
        n_iters=args.n_iters, batch_size=args.batch_size,
        learning_rate=args.learning_rate, step_type=args.step_type,
        sigmas=(1.0, 3.0, 10.0, 30.0),
        clip_range=(float(np.log(1e-4)), float(np.log(2.478e4))),
        feature_fn=feature_fn, log_every=20, remat=True,
    )
    print(f"  optimized in {time.time()-t0:.0f}s; "
          f"mmd {out['history'][0]:.5f} -> {out['history'][-1]:.5f}",
          flush=True)

    print("4/4 FID: initial vs optimized grid...", flush=True)

    def fid_of_grid(grid):
        chunks = []
        bs = min(500, args.fid_samples)
        for i in range(-(-args.fid_samples // bs)):  # ceil: keep remainder
            chunks.append(np.asarray(sample_with_grid(
                ema_ddpm, jnp.asarray(grid), jax.random.fold_in(
                    jax.random.PRNGKey(777), i
                ), (bs, 3, 32, 32), args.step_type,
            )))
        samples = np.concatenate(chunks)[: args.fid_samples]
        return float(compute_fid(jnp.asarray(samples)))

    fid_init = fid_of_grid(np.asarray(init))
    fid_opt = fid_of_grid(out["log_temp"])
    result = {
        "checkpoint_step": step, "n_steps": args.n_steps,
        "step_type": args.step_type,
        "fid_linear_beta_init": round(fid_init, 3),
        "fid_optimized": round(fid_opt, 3),
        "init_log_temp": [round(float(v), 4) for v in np.asarray(init)],
        "optimized_log_temp": [
            round(float(v), 4) for v in out["log_temp"]
        ],
        "mmd_history_first_last": [
            float(out["history"][0]), float(out["history"][-1])
        ],
    }
    with open(args.out + ".json", "w") as f:
        json.dump(result, f, indent=1)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
