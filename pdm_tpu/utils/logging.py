"""Training observability: CSV metrics logger (wandb-optional) and the
periodic evaluation hook (sample grid + FID on EMA weights).

Capability parity: reference trainer's wandb logging + evaluate()
(ddpm_trainer.py:104-150, 182-213). Offline-first: CSV always; wandb only
if importable and WANDB_MODE allows.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional

import numpy as np


class CSVLogger:
    """Append-only CSV of (step, metric, value, wall_time)."""

    def __init__(self, path: str, use_wandb: bool = False, run_name: str = ""):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._new = not os.path.exists(path)
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - wandb optional
                import wandb

                self._wandb = wandb
                wandb.init(
                    project="physics-of-diffusion-models",
                    name=run_name or None,
                    id=run_name or None,
                    resume="allow",
                )
            except Exception:
                self._wandb = None

    def __call__(self, step: int, metrics: Dict[str, float]) -> None:
        with open(self.path, "a", newline="") as f:
            writer = csv.writer(f)
            if self._new:
                writer.writerow(["step", "metric", "value", "time"])
                self._new = False
            now = time.time()
            for k, v in metrics.items():
                writer.writerow([step, k, v, now])
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, step: int, tag: str, images: np.ndarray) -> None:
        """(N, C, H, W) in [-1, 1] -> wandb image panel (no-op without
        wandb). Parity: the reference logs eval sample grids as a list of
        wandb.Image per eval step (ddpm_trainer.py:130-143)."""
        if self._wandb is None:
            return
        from ..utils.data import to_uint8

        imgs = np.transpose(to_uint8(np.asarray(images)), (0, 2, 3, 1))
        if imgs.shape[-1] == 1:
            imgs = imgs[..., 0]
        self._wandb.log(
            {tag: [self._wandb.Image(im) for im in imgs]}, step=step
        )


def save_image_grid(images: np.ndarray, path: str, nrow: int = 5) -> None:
    """(N, C, H, W) in [-1, 1] -> PNG grid."""
    from ..utils.data import to_uint8

    imgs = to_uint8(images)
    n, c, h, w = imgs.shape
    ncol = nrow
    nrows = int(np.ceil(n / ncol))
    grid = np.zeros((c, nrows * h, ncol * w), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[:, r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    arr = np.transpose(grid, (1, 2, 0))
    if c == 1:
        arr = arr[:, :, 0]
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:  # pragma: no cover
        np.save(path + ".npy", arr)


def make_eval_fn(
    config, reference_data, sample_dir: str = "eval_samples", logger=None
):
    """Periodic eval hook: DDIM-100 on EMA weights -> 25-image grid +
    FID over fid_samples (parity: reference evaluate()). FID is skipped
    gracefully when the feature extractor's weights are unavailable.
    ``logger``: a CSVLogger — eval grids are forwarded to its wandb image
    panel when wandb is active."""
    import jax
    import jax.numpy as jnp

    from ..diffusion.sampling import DDPMSampler
    from ..schedulers.from_config import scheduler_from_config

    compute_fid = None
    fid_error = None
    try:
        from .fid import get_compute_fid, get_feature_fn

        feature_fn, fdim = get_feature_fn(config.dataset_name)
        compute_fid = get_compute_fid(reference_data, feature_fn, fdim)
    except Exception as e:  # offline weights missing
        if getattr(config.fid, "required", False):
            raise RuntimeError(
                f"fid.required=true but the FID feature extractor is "
                f"unavailable: {e}"
            ) from e
        fid_error = e

    os.makedirs(sample_dir, exist_ok=True)
    scheduler = scheduler_from_config(config)

    def eval_fn(ema_ddpm, step: int) -> Dict[str, float]:
        sampler = DDPMSampler(
            ddpm=ema_ddpm,
            scheduler=scheduler,
            n_steps=100,
            obj_size=config.dataset_config.obj_size,
            batch_size=min(500, config.dataset_config.fid_samples),
            n_samples=25,
            step_type="ddim",
        )
        grid = sampler.sample(jax.random.PRNGKey(step))["x"]
        save_image_grid(grid, os.path.join(sample_dir, f"step_{step}.png"))
        if logger is not None:
            logger.log_images(step, "eval_samples", grid)
        metrics: Dict[str, float] = {}
        if compute_fid is None:
            # per-eval, not once-at-construction: a long run must not
            # silently finish with no quality metric (set fid.required
            # to make this a hard error instead)
            import warnings

            warnings.warn(
                f"[eval step {step}] FID unavailable — no quality metric "
                f"is being recorded ({fid_error})",
                stacklevel=2,
            )
        if compute_fid is not None:
            n_fid = (
                config.fid.samples or config.dataset_config.fid_samples
            )
            sampler = DDPMSampler(
                ddpm=ema_ddpm,
                scheduler=scheduler,
                n_steps=100,
                obj_size=config.dataset_config.obj_size,
                # bs=64 is the measured UNet forward-throughput optimum
                # on v5e (VMEM-resident 16x16 activations; round-3 batch
                # sweep in bench.py) — ~30% faster than large batches
                batch_size=min(64, n_fid),
                n_samples=n_fid,
                step_type="ddim",
            )
            samples = sampler.sample(jax.random.PRNGKey(step + 1))["x"]
            metrics["fid_100_steps"] = compute_fid(jnp.asarray(samples))
        return metrics

    return eval_fn
