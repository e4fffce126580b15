"""256x256 training convergence check on the real chip.

Complements scripts/highres_probe.py (throughput) with an end-to-end
answer to "does the high-res path TRAIN": the celebahq-256 architecture
(113.7M params) trained for a few hundred real optimizer steps through
the production trainer (donated step, EMA, warmup LR, grad clip) on a
synthetic 256x256 smooth-blob dataset, asserting the loss drops well
below the eps-prediction baseline of 1.0 (MSE vs unit-normal noise at
init is ~1 for a zero-output network).

Run: python scripts/highres_train_check.py [--steps 300] [--bs 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup_jax  # noqa: E402
from highres_probe import CELEBAHQ_UNET, SIZE  # noqa: E402


def make_highres_blobs(n, size, seed=0):
    """Smooth random images: mixtures of broad Gaussians per channel,
    normalized to [-1, 1] — enough structure for a denoising loss to have
    signal without any external data."""
    import numpy as np

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.zeros((n, 3, size, size), np.float32)
    for i in range(n):
        for c in range(3):
            acc = np.zeros((size, size), np.float32)
            for _ in range(4):
                cx, cy = rng.rand(2)
                s = 0.08 + 0.25 * rng.rand()
                a = rng.randn()
                acc += a * np.exp(
                    -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
                )
            acc -= acc.mean()
            acc /= max(1e-6, np.abs(acc).max())
            imgs[i, c] = acc
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--n-data", type=int, default=256)
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet import unet_from_config
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    net = unet_from_config(3, CELEBAHQ_UNET, dtype=jnp.bfloat16)
    sched = LinearBetaScheduler(1e-4, 2.478e4)
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), sched, net, (3, SIZE, SIZE),
        parametrization="eps",
    )

    data = jnp.asarray(make_highres_blobs(args.n_data, SIZE))
    losses = {}
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=1e-4, warmup_steps=50,
        total_iters=args.steps, grad_clip=1.0, ema_decay=0.999,
        eval_steps=10 ** 9,
        log_fn=lambda step, m: losses.__setitem__(step, float(m["loss"])),
    )
    t0 = time.time()
    trainer.train(data, batch_size=args.bs, total_iters=args.steps,
                  log_every=50)
    wall = time.time() - t0

    first = losses[min(losses)]
    last = losses[max(losses)]
    print(f"loss trajectory: {dict(sorted(losses.items()))}", flush=True)
    print(json.dumps({
        "arch": "ddpm-celebahq-256",
        "steps": args.steps,
        "batch_size": args.bs,
        "first_logged_loss": round(first, 4),
        "final_loss": round(last, 4),
        "wall_s": round(wall, 1),
        "img_per_sec_incl_compile": round(args.steps * args.bs / wall, 1),
    }), flush=True)
    assert last < 0.5 * first, (
        f"256x256 training did not converge: {first} -> {last}"
    )
    print("OK: high-res training converges", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
