"""Endurance run: the flagship CIFAR-config UNet trained for O(10^5)
steps on a synthetic RGB distribution, with the production cadence —
EMA 0.9999, warmup + linear-decay LR tail, periodic eval (DDIM sampling +
FID against a locally-trained LeNet extractor), async Orbax checkpoints,
and crash-safe auto-resume.

Purpose: prove the trainer's long-horizon behavior (EMA time constant,
LR tail to zero, checkpoint cadence overlap, resume-after-crash) at the
reference's real model scale (config/groups/ddpm.yaml: 128/256/256/256,
3 layers/block, attn@16^2) without the reference's 1.5M-iteration
CIFAR-10 recipe being runnable offline.

Crash drill: ``--crash_at N`` hard-kills the process (os._exit) right
after step N — past the async checkpoint at the previous cadence point —
then a relaunch must auto-resume from the last *published* latest.txt
and finish. Run via:

    python longrun_endurance.py --crash_at 30000 ; \
    python longrun_endurance.py   # resumes, trains to --steps, evals
"""

import argparse
import json
import os
import time

import numpy as np

from _common import setup_jax


def make_rgb_blob_dataset(n, size=32, seed=0):
    """k in {1..4} colored Gaussian bumps per image; label = k-1."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size]
    k = rng.randint(1, 5, n)
    imgs = np.zeros((n, 3, size, size), np.float32)
    for i in range(n):
        for _ in range(k[i]):
            cy, cx = rng.uniform(3, size - 3, 2)
            s = rng.uniform(1.5, 3.0)
            color = rng.dirichlet(np.ones(3)) * rng.uniform(1.0, 2.0)
            bump = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
            imgs[i] += color[:, None, None] * bump
    imgs = np.clip(imgs, 0, 1) * 2.0 - 1.0
    return imgs, (k - 1).astype(np.int32)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=60_000)
    parser.add_argument("--n_data", type=int, default=50_000)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--warmup", type=int, default=3_000)
    parser.add_argument("--eval_every", type=int, default=10_000)
    parser.add_argument("--ckpt_every", type=int, default=5_000)
    parser.add_argument("--eval_samples", type=int, default=2_500)
    parser.add_argument("--crash_at", type=int, default=0,
                        help="os._exit right after this step (crash drill)")
    parser.add_argument("--ckpt_dir", default="checkpoints/endurance")
    parser.add_argument("--log_csv", default="logs/endurance.csv")
    parser.add_argument("--out_json", default="endurance_result.json")
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
    from pdm_tpu.utils.logging import CSVLogger

    os.makedirs(os.path.dirname(args.log_csv) or ".", exist_ok=True)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    print("1/5 dataset (50k 32x32 RGB blob images)...", flush=True)
    imgs, labels = make_rgb_blob_dataset(args.n_data)
    data = jnp.asarray(imgs)

    print("2/5 LeNet FID extractor...", flush=True)
    model, lenet_params = train_lenet(
        jax.random.PRNGKey(0), data, jnp.asarray(labels),
        batch_size=256, epochs=3, verbose=False,
    )

    @jax.jit
    def feature_fn(x):
        return model.apply({"params": lenet_params}, x, features_only=True)

    compute_fid = get_compute_fid(data, feature_fn, 100)

    print("3/5 flagship UNet (reference ddpm.yaml config, 3ch/32px)...",
          flush=True)
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

    logger = CSVLogger(args.log_csv)
    eval_hist = []

    def eval_fn(ema_ddpm, step):
        sampler = DDPMSampler(
            ddpm=ema_ddpm, scheduler=sched, n_steps=100,
            obj_size=(3, 32, 32), batch_size=500,
            n_samples=args.eval_samples, step_type="ddim", precision="half",
        )
        t0 = time.time()
        samples = sampler.sample(jax.random.PRNGKey(step))["x"]
        fid = compute_fid(jnp.asarray(samples))
        eval_hist.append({"step": step, "fid": float(fid)})
        print(f"  [eval @ {step}] FID(DDIM-100, {args.eval_samples})="
              f"{fid:.3f}  ({time.time()-t0:.0f}s)", flush=True)
        return {"fid": float(fid)}

    crash_box = {"armed": args.crash_at > 0}

    def log_fn(step, metrics):
        logger(step, metrics)
        if step % 1000 == 0:
            print(f"  step {step}: {metrics}", flush=True)
        if crash_box["armed"] and step >= args.crash_at:
            print(f"  CRASH DRILL: os._exit at step {step}", flush=True)
            os._exit(17)

    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=2e-4, warmup_steps=args.warmup,
        total_iters=args.steps, grad_clip=1.0, ema_decay=0.9999,
        checkpoint_dir=args.ckpt_dir, checkpoint_every=args.ckpt_every,
        eval_steps=args.eval_every, eval_fn=eval_fn, log_fn=log_fn,
    )

    resume = trainer.latest_checkpoint_step()
    print(f"4/5 train to {args.steps} (resume from: {resume})...", flush=True)
    t0 = time.time()
    state = trainer.train(
        data, batch_size=args.batch_size, total_iters=args.steps,
        log_every=200,
    )
    train_s = time.time() - t0

    print("5/5 final quality (EMA params, DDIM-100) + floor...", flush=True)
    if eval_hist and eval_hist[-1]["step"] == args.steps:
        # the in-loop eval already ran at the final step
        final = {"fid": eval_hist[-1]["fid"]}
    else:
        ema_ddpm = ddpm.with_params(state.ema_params)
        final = eval_fn(ema_ddpm, args.steps)
    floor = float(compute_fid(data[: args.eval_samples]))
    steps_run = args.steps - (resume or 0)
    result = {
        "steps": args.steps, "resumed_from": resume,
        "train_seconds": round(train_s, 1),
        "img_per_sec": round(steps_run * args.batch_size / train_s, 1),
        "final_fid": final["fid"], "fid_floor": floor,
        "eval_history": eval_hist,
    }
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
