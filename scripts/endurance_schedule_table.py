"""Schedule-ordering FID table on the endurance checkpoint.

Loads the EMA parameters from the endurance run (longrun_endurance.py),
derives data-driven schedules (entropy-uniform from a forward sweep,
metric-geodesic from the empirical Fisher-Rao metric) for the SAME blob
distribution, and computes the FID grid

    {5, 10, 20, 50, 100} steps x {linear_beta, cosine, entropy, metric}

with the locally-trained LeNet extractor. This is the reference's core
claim (analyze_fids.ipynb cell 4: data-driven schedules beat analytic
ones at low step counts) demonstrated at the flagship model scale on
32x32 RGB images, fully offline.

Writes endurance_schedule_table.{json,md}.
"""

import argparse
import json
import os
import time

import numpy as np

from _common import setup_jax
from longrun_endurance import make_rgb_blob_dataset


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", default="checkpoints/endurance")
    parser.add_argument("--n_data", type=int, default=50_000)
    parser.add_argument("--fid_samples", type=int, default=5_000)
    parser.add_argument("--steps", type=int, nargs="+",
                        default=[5, 10, 20, 50, 100])
    parser.add_argument("--step_type", default="ddpm",
                        choices=["ddpm", "ddim", "heun", "dpmpp_2m"])
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    if args.out is None:
        # never silently overwrite the ddpm baseline with another rule's run
        suffix = "" if args.step_type == "ddpm" else f"_{args.step_type}"
        args.out = "endurance_schedule_table" + suffix

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.lenet import train_lenet
    from pdm_tpu.models.unet import unet_from_config
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import (
        CosineScheduler, LinearBetaScheduler,
    )
    from pdm_tpu.schedulers.interpolated import (
        entropy_scheduler, metric_scheduler,
    )
    from pdm_tpu.stats.sweep import forward_stats, metric_stats
    from pdm_tpu.utils.fid import get_compute_fid

    print("1/4 data + LeNet extractor (same seeds as the endurance run)...",
          flush=True)
    imgs, labels = make_rgb_blob_dataset(args.n_data)
    data = jnp.asarray(imgs)
    model, lenet_params = train_lenet(
        jax.random.PRNGKey(0), data, jnp.asarray(labels),
        batch_size=256, epochs=3, verbose=False,
    )

    @jax.jit
    def feature_fn(x):
        return model.apply({"params": lenet_params}, x, features_only=True)

    compute_fid = get_compute_fid(data, feature_fn, 100)

    print("2/4 data-driven schedules (forward sweep + FR metric)...",
          flush=True)
    temps = np.logspace(-4, 4.5, 32)
    fstats = forward_stats(
        jax.random.PRNGKey(1), data, temps, n_samples=512, batch_size=512
    )
    ent_sched = entropy_scheduler(
        fstats["temp"], fstats["entropy"], extrapolate=True, min_temp=1e-4
    )
    mstats = metric_stats(
        jax.random.PRNGKey(2), data, temps, n_samples=256, batch_size=256,
        regularize=True,
    )
    met_sched = metric_scheduler(mstats["log_temp"], mstats["metric"])

    print("3/4 EMA params from the endurance checkpoint...", flush=True)
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

    print("4/4 FID grid...", flush=True)
    schedules = [
        ("linear_beta", sched),
        ("cosine", CosineScheduler(1e-4, 2.478e4)),
        ("entropy", ent_sched),
        ("metric", met_sched),
    ]
    table = {}
    for name, s in schedules:
        for n in args.steps:
            sampler = DDPMSampler(
                ddpm=ema_ddpm, scheduler=s, n_steps=n,
                obj_size=(3, 32, 32), batch_size=500,
                n_samples=args.fid_samples, step_type=args.step_type,
                precision="half",
            )
            t0 = time.time()
            samples = sampler.sample(jax.random.PRNGKey(100 + n))["x"]
            fid = float(compute_fid(jnp.asarray(samples)))
            table[f"{name}@{n}"] = round(fid, 3)
            print(f"  {name:>12} @ {n:3d}: FID={fid:8.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    floor = float(compute_fid(data[: args.fid_samples]))
    out = {"checkpoint_step": step, "fid_floor": round(floor, 3),
           "table": table}
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        f"# Endurance-checkpoint schedule-ordering FID (blob-32, "
        f"step {step}, {args.step_type} steps, floor {floor:.3f})", "",
        "| schedule | " + " | ".join(str(n) for n in args.steps) + " |",
        "|---|" + "---|" * len(args.steps),
    ]
    for name, _ in schedules:
        row = [f"{table[f'{name}@{n}']:.2f}" for n in args.steps]
        lines.append(f"| {name} | " + " | ".join(row) + " |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
