"""Solver-family FID table on the endurance checkpoint.

Fixes the schedule (linear-beta — the best-behaved geometry for the
deterministic solvers, scripts/endurance_heun_table.md) and sweeps the
SOLVER axis at few-NFE level counts:

    {3, 5, 10, 20, 50} levels x {ddpm, ddim, heun, dpmpp_2m}

reporting FID together with the true NFE per sample (ddpm/ddim/dpmpp_2m:
n; heun: 2n-1) — the practically-relevant comparison is FID at equal
model-eval budget, where the multistep dpmpp_2m solver should dominate
heun (same order, half the evals).

Beyond the reference (which has only ancestral DDPM + DDIM,
/root/reference/diffusion/ddpm_sampling.py:94-110).
Writes endurance_solver_table.{json,md}.
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
    parser.add_argument("--n_data", type=int, default=50_000)
    parser.add_argument("--fid_samples", type=int, default=5_000)
    parser.add_argument("--steps", type=int, nargs="+",
                        default=[3, 5, 10, 20, 50])
    parser.add_argument("--solvers", nargs="+",
                        default=["ddpm", "ddim", "heun", "dpmpp_2m"])
    parser.add_argument("--out", default="endurance_solver_table")
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.lenet import train_lenet
    from pdm_tpu.models.unet import unet_from_config
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler
    from pdm_tpu.utils.fid import get_compute_fid

    print("1/3 data + LeNet extractor (same seeds as the endurance run)...",
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

    print("2/3 EMA params from the endurance checkpoint...", flush=True)
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

    print("3/3 FID grid...", flush=True)
    table = {}
    for solver in args.solvers:
        for n in args.steps:
            nfe = 2 * n - 1 if solver == "heun" else n
            sampler = DDPMSampler(
                ddpm=ema_ddpm, scheduler=sched, n_steps=n,
                obj_size=(3, 32, 32), batch_size=500,
                n_samples=args.fid_samples, step_type=solver,
                precision="half",
            )
            t0 = time.time()
            samples = sampler.sample(jax.random.PRNGKey(200 + n))["x"]
            fid = float(compute_fid(jnp.asarray(samples)))
            table[f"{solver}@{n}"] = {"fid": round(fid, 3), "nfe": nfe}
            print(f"  {solver:>9} @ {n:3d} levels (NFE {nfe:3d}): "
                  f"FID={fid:10.3f} ({time.time()-t0:.0f}s)", flush=True)

    floor = float(compute_fid(data[: args.fid_samples]))
    out = {"checkpoint_step": step, "fid_floor": round(floor, 3),
           "schedule": "linear_beta", "table": table}
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        f"# Endurance-checkpoint solver-family FID (blob-32, step {step}, "
        f"linear-beta schedule, floor {floor:.3f})", "",
        "FID (NFE) per solver and level count:", "",
        "| solver | " + " | ".join(str(n) for n in args.steps) + " |",
        "|---|" + "---|" * len(args.steps),
    ]
    for solver in args.solvers:
        row = [
            f"{table[f'{solver}@{n}']['fid']:.2f} "
            f"({table[f'{solver}@{n}']['nfe']})"
            for n in args.steps
        ]
        lines.append(f"| {solver} | " + " | ".join(row) + " |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
