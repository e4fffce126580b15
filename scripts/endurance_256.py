"""256x256 endurance: the high-res family at production cadence (VERDICT r3 #4).

Round 3 proved the 113.7M-param celebahq-256 architecture converges for
300 plain-bs=8 steps and measured its throughput; this run closes the gap
to a *pipeline-proven* claim: a multi-thousand-step run at the REFERENCE
global batch (ddpm_training.yaml batch_size=128, reached as bs=8 x
grad_accum=16 — identical optimizer math, SURVEY C19) with the full
production cadence — async Orbax checkpoints + retention + auto-resume,
periodic eval that SAMPLES 256x256 images through the production DDIM
path and scores them with FID-proxy features (a LeNet trained on the
same synthetic distribution, downsampled to its 32x32 input — the
reference's LeNet-FID protocol, utils/fid.py:31-48, applied at high
res), and a 256x256 sampling throughput row for the benchmark table.

Dataset: synthetic 256x256 "blob count" images (k in 1..4 colored bumps,
label k-1) — structured enough for denoising loss, class-labeled so the
LeNet feature net trains to a real discrimination task offline.

Run: python scripts/endurance_256.py [--steps 2000] [--resume-check]
Writes endurance_256.md + endurance_256.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup_jax  # noqa: E402
from highres_probe import CELEBAHQ_UNET, SIZE  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_blob_dataset(n, size, seed=0):
    """k in {1..4} colored Gaussian bumps per image; label = k-1."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    k = rng.randint(1, 5, n)
    imgs = np.zeros((n, 3, size, size), np.float32)
    for i in range(n):
        for _ in range(k[i]):
            cy, cx = rng.uniform(0.1 * size, 0.9 * size, 2)
            s = rng.uniform(0.04, 0.12) * size
            color = rng.dirichlet(np.ones(3)) * rng.uniform(1.0, 2.0)
            bump = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
            imgs[i] += color[:, None, None] * bump
    imgs = np.clip(imgs, 0, 1) * 2.0 - 1.0
    return imgs, (k - 1).astype(np.int32)


def downsample32(x):
    """(B, 3, 256, 256) -> (B, 3, 32, 32) mean-pool for the LeNet."""
    B, C, H, W = x.shape
    f = H // 32
    return x.reshape(B, C, 32, f, 32, f).mean(axis=(3, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--bs", type=int, default=8, help="micro-batch")
    ap.add_argument("--grad_accum", type=int, default=16)
    ap.add_argument("--n_data", type=int, default=512)
    ap.add_argument("--ckpt_every", type=int, default=500)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--eval_samples", type=int, default=64)
    ap.add_argument("--ckpt_dir", default="checkpoints/endurance_256")
    ap.add_argument("--out_suffix", default="",
                    help="suffix for the results files (resume drill "
                         "writes endurance_256_resume.{json,md} without "
                         "clobbering the main run's results)")
    args = ap.parse_args()

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

    os.makedirs(args.ckpt_dir, exist_ok=True)
    t_wall0 = time.time()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    global_batch = args.bs * args.grad_accum
    data_np, labels_np = make_blob_dataset(args.n_data, SIZE)
    data = jnp.asarray(data_np)

    # --- FID-proxy feature net: LeNet on the 32x32-downsampled blobs ----
    small = jnp.asarray(downsample32(data_np))
    lenet, lenet_params = train_lenet(
        jax.random.PRNGKey(11), small, jnp.asarray(labels_np),
        epochs=8, batch_size=128, verbose=False,
    )

    @jax.jit
    def feature_fn(x32):
        return lenet.apply({"params": lenet_params}, x32, features_only=True)

    compute_fid = get_compute_fid(small, feature_fn, 100)

    net = unet_from_config(3, CELEBAHQ_UNET, dtype=jnp.bfloat16)
    sched = LinearBetaScheduler(1e-4, 2.478e4)
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), sched, net, (3, SIZE, SIZE),
        parametrization="eps",
    )

    history = {"loss": {}, "fid_proxy": {}, "eval_s": {}}

    def eval_fn(ema_ddpm, step):
        t0 = time.time()
        sampler = DDPMSampler(
            ddpm=ema_ddpm, scheduler=sched, n_steps=50,
            obj_size=(3, SIZE, SIZE), batch_size=args.bs,
            n_samples=args.eval_samples, step_type="ddim", precision="half",
        )
        out = sampler.sample(jax.random.PRNGKey(step))
        fid = float(compute_fid(jnp.asarray(downsample32(out["x"]))))
        dt = time.time() - t0
        history["fid_proxy"][step] = fid
        history["eval_s"][step] = round(dt, 1)
        print(f"[eval {step}] fid_proxy={fid:.3f} ({dt:.0f}s, "
              f"{args.eval_samples} DDIM-50 256x256 samples)", flush=True)
        return {"fid_proxy": fid}

    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=1e-4, warmup_steps=100,
        total_iters=args.steps, grad_clip=1.0, ema_decay=0.999,
        grad_accum=args.grad_accum,
        checkpoint_dir=args.ckpt_dir, checkpoint_every=args.ckpt_every,
        keep_checkpoints=2, eval_steps=args.eval_every, eval_fn=eval_fn,
        # eval-metric dicts (fid_proxy) log at the same step as the train
        # loss — only record entries that actually carry a loss, or the
        # final loss in the results file becomes NaN
        log_fn=lambda s, m: (
            history["loss"].__setitem__(s, float(m["loss"]))
            if "loss" in m else None
        ) or print(f"[step {s}] {m}", flush=True),
    )

    t0 = time.time()
    state = trainer.train(
        data, batch_size=global_batch, total_iters=args.steps, log_every=100
    )
    train_wall = time.time() - t0
    resumed_from = trainer.latest_checkpoint_step()

    # --- 256x256 sampling benchmark row ---------------------------------
    ema = trainer.ddpm.with_params(state.ema_params)
    bench = {}
    for n_steps, step_type in ((50, "ddim"), (1000, "ddpm")):
        sampler = DDPMSampler(
            ddpm=ema, scheduler=sched, n_steps=n_steps,
            obj_size=(3, SIZE, SIZE), batch_size=args.bs, n_samples=args.bs,
            step_type=step_type, precision="half",
        )
        # warm twice: 256x256 donated-layout fixed point (verify skill)
        out = sampler.batch_sample(jax.random.PRNGKey(0))
        _ = float(jnp.sum(out["x"]))
        out = sampler.batch_sample(jax.random.PRNGKey(1))
        _ = float(jnp.sum(out["x"]))
        t1 = time.time()
        out = sampler.batch_sample(jax.random.PRNGKey(2))
        _ = float(jnp.sum(out["x"]))
        dt = time.time() - t1
        bench[f"{step_type}{n_steps}_img_per_sec"] = round(args.bs / dt, 3)
        print(f"[bench256] {step_type}-{n_steps}: {args.bs / dt:.3f} img/s",
              flush=True)

    losses = history["loss"]
    result = {
        "arch": "ddpm-celebahq-256 (113.7M)",
        "steps": args.steps,
        "global_batch": global_batch,
        "micro_batch": args.bs,
        "grad_accum": args.grad_accum,
        "first_logged_loss": losses[min(losses)] if losses else None,
        "final_loss": losses[max(losses)] if losses else None,
        "fid_proxy": history["fid_proxy"],
        "eval_s": history["eval_s"],
        "resumed_from": resumed_from,
        "train_wall_s": round(train_wall, 1),
        "img_per_sec_incl_compile": round(
            args.steps * global_batch / train_wall, 1
        ),
        "sampling_256": bench,
        "total_wall_s": round(time.time() - t_wall0, 1),
    }
    with open(os.path.join(REPO, f"endurance_256{args.out_suffix}.json"), "w") as f:
        json.dump(result, f, indent=1)

    md = [
        "# 256x256 endurance (round 5)",
        "",
        "113.7M-param celebahq-256 architecture at the reference global "
        f"batch ({global_batch} = {args.bs} x grad_accum {args.grad_accum}), "
        "production cadence: async Orbax checkpoints every "
        f"{args.ckpt_every} steps (retention 2, auto-resume contract), "
        f"eval every {args.eval_every} steps sampling {args.eval_samples} "
        "DDIM-50 images at 256x256 through the production scan sampler and "
        "scoring them with LeNet FID-proxy features (the reference's "
        "MNIST-LeNet FID protocol applied to the synthetic blob "
        "distribution).",
        "",
        "| metric | value |",
        "|---|---|",
        f"| steps x global batch | {args.steps} x {global_batch} |",
        f"| loss first -> final | {result['first_logged_loss']:.4f} -> "
        f"{result['final_loss']:.4f} |",
        f"| FID-proxy trajectory | {history['fid_proxy']} |",
        f"| train wall | {train_wall / 60:.1f} min "
        f"({result['img_per_sec_incl_compile']} img/s incl. compile) |",
        f"| 256x256 DDIM-50 sampling | "
        f"{bench.get('ddim50_img_per_sec')} img/s |",
        f"| 256x256 DDPM-1000 sampling | "
        f"{bench.get('ddpm1000_img_per_sec')} img/s |",
        "",
        "Full numbers: `endurance_256.json`. "
        "Run: `python scripts/endurance_256.py`.",
    ]
    with open(os.path.join(REPO, f"endurance_256{args.out_suffix}.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
