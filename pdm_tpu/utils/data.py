"""Data layer: dataset ingest to a device-resident tensor.

TPU-first design: every dataset used by the reference (CIFAR-10 at 32x32 is
600 MB in fp32; MNIST less) fits in one chip's HBM, so the framework loads
the ENTIRE dataset to device once and training/stats draw minibatches with
on-device gathers — eliminating the reference's per-step host->device copy
(ddpm_trainer.py:194) and its DataLoader worker processes.

Sources:
  * HF datasets (when available in the local cache — this environment has
    no egress; loading gracefully reports if the dataset isn't cached)
  * synthetic generators (utils/synthetic.py) — fully offline

Transforms match the reference (data.py:23-68): resize to the config's
image size, scale to [-1, 1]. Horizontal-flip augmentation is applied
per-batch on device by the trainer, not at ingest.

Capability parity: reference ``utils/data.py``.
"""

from __future__ import annotations

import os
from typing import Generator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..config.config import Config
from . import synthetic


def _to_chw_float(img, image_size: Tuple[int, int], channels: int) -> np.ndarray:
    """PIL image or array -> (C, H, W) float32 in [-1, 1], resized."""
    try:
        from PIL import Image

        if isinstance(img, Image.Image):
            if img.size != (image_size[1], image_size[0]):
                img = img.resize((image_size[1], image_size[0]), Image.BILINEAR)
            arr = np.asarray(img)
        else:
            arr = np.asarray(img)
    except ImportError:  # pragma: no cover
        arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[-1] != channels:
        if channels == 1:
            arr = arr.mean(-1, keepdims=True)
        else:
            arr = np.repeat(arr[:, :, :1], channels, axis=-1)
    arr = arr.astype(np.float32) / 255.0
    return np.transpose(arr * 2.0 - 1.0, (2, 0, 1))


def load_hf_images(
    hf_name: str,
    image_key: str,
    image_size: Tuple[int, int],
    channels: int,
    split: str = "train",
    limit: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(N, C, H, W) float32 in [-1, 1] (+labels if present) from a
    locally-cached HF dataset."""
    from datasets import load_dataset  # type: ignore

    try:
        ds = load_dataset(hf_name, split=split)
    except Exception as e:
        raise RuntimeError(
            f"dataset {hf_name!r} is not in the local HF cache and this "
            f"environment has no network access. Pre-populate the cache, "
            f"point HF_DATASETS_CACHE at one, or use a synthetic dataset "
            f"(gmm1d / gaussian / anisotropic_gmm_repro). Original error: "
            f"{type(e).__name__}: {e}"
        ) from e
    n = len(ds) if limit is None else min(limit, len(ds))
    labels = None
    if "label" in ds.column_names:
        labels = np.empty((n,), np.int32)

    # fast path: collect raw uint8 HWC frames, then one multithreaded
    # native resize + normalize pass (pdm_tpu.runtime)
    try:
        from .. import runtime

        raw = np.empty((n, *_first_hw(ds, image_key), channels), np.uint8)
        for i in range(n):
            row = ds[i]
            raw[i] = _to_hwc_u8(row[image_key], channels)
            if labels is not None:
                labels[i] = row["label"]
        raw = runtime.resize_bilinear_u8(raw, *image_size)
        return runtime.normalize_u8_to_chw_f32(raw), labels
    except Exception as e:
        # ragged sizes or no toolchain: per-image python path. Surface the
        # reason — the PIL fallback has (slightly) different resize
        # numerics, so a silently-swallowed native defect would make the
        # training set depend on which path happened to run.
        import warnings

        warnings.warn(
            f"native ingest fast path unavailable ({type(e).__name__}: {e});"
            f" falling back to per-image python ingest", stacklevel=2,
        )

    imgs = np.empty((n, channels, *image_size), np.float32)
    for i in range(n):
        row = ds[i]
        imgs[i] = _to_chw_float(row[image_key], image_size, channels)
        if labels is not None:
            labels[i] = row["label"]
    return imgs, labels


def _first_hw(ds, image_key):
    arr = np.asarray(ds[0][image_key])
    return arr.shape[0], arr.shape[1]


def _to_hwc_u8(img, channels: int) -> np.ndarray:
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[-1] != channels:
        if channels == 1:
            arr = arr.mean(-1, keepdims=True).astype(np.uint8)
        else:
            arr = np.repeat(arr[:, :, :1], channels, axis=-1)
    return arr.astype(np.uint8)


def get_data_array(
    config: Config, train: bool = True, limit: Optional[int] = None
) -> np.ndarray:
    """Host-side (N, C, H, W) array for the configured dataset."""
    ds_cfg = config.dataset_config
    if ds_cfg.synthetic_name is not None:
        name = ds_cfg.synthetic_name
        if name == "gmm1d":
            return synthetic.generate_gmm_1d(1_000_000)
        if name == "anisotropic_gmm":
            samples, _, _ = synthetic.generate_anisotropic_gmm(
                dim=ds_cfg.image_size[0], n_samples=50_000
            )
            return samples
        data = synthetic.generate_dataset(name, d=ds_cfg.channels)
        return data.reshape(len(data), ds_cfg.channels, 1, 1)
    # pre-staged PDMC cache (scripts/prepare_data.py): uint8 NHWC, mmap'd
    # and decoded to [-1, 1] CHW fp32 by the native runtime
    cache = _pdmc_cache_path(ds_cfg.name, train)
    if os.path.exists(cache):
        from .. import runtime

        raw = runtime.read_cache(cache)  # (N, H, W, C) uint8
        if limit is not None:
            raw = raw[:limit]
        return runtime.normalize_u8_to_chw_f32(np.asarray(raw))
    if ds_cfg.hf_dataset_name is not None:
        imgs, _ = load_hf_images(
            ds_cfg.hf_dataset_name,
            ds_cfg.image_key,
            ds_cfg.image_size,
            ds_cfg.channels,
            split="train" if train else "test",
            limit=limit,
        )
        return imgs
    raise ValueError(f"dataset {ds_cfg.name} has no data source")


def _pdmc_cache_path(name: str, train: bool) -> str:
    root = os.environ.get("PDM_DATA_CACHE", "data_cache")
    return os.path.join(root, f"{name}_{'train' if train else 'test'}.pdmc")


def get_data_tensor(
    config: Config, train: bool = True, limit: Optional[int] = None
) -> Array:
    """Device-resident dataset tensor (the framework's canonical form)."""
    return jnp.asarray(get_data_array(config, train=train, limit=limit))


# ---------------------------------------------------------------------------
# host-resident path for datasets larger than HBM
# ---------------------------------------------------------------------------

HBM_DATA_BUDGET_BYTES = 8 << 30  # keep half of a v5e's 16 GB for the model


class HostResidentData:
    """Dataset kept in host RAM (optionally uint8-compressed / mmap'd from
    a PDMC cache); per-step minibatches are gathered by the native C++
    runtime into a staging buffer and shipped to device.

    This is the path for the 256x256 families (>20 GB fp32), where the
    reference streamed through DataLoader workers; device-resident arrays
    (utils.data.get_data_tensor) remain the default for everything that
    fits (SURVEY §7 hard part (e)).
    """

    def __init__(self, data, batch_size: int):
        from .. import runtime

        self._runtime = runtime
        self.data = data
        self.batch_size = batch_size
        self.shape = data.shape
        self._staging = np.empty(
            (batch_size, int(np.prod(data.shape[1:]))), np.float32
        )

    def __len__(self) -> int:
        return self.shape[0]

    def gather(self, idx: np.ndarray) -> np.ndarray:
        # slice the staging buffer for partial batches (e.g. a final
        # remainder); oversize requests get a fresh buffer
        if len(idx) <= self.batch_size:
            staging = self._staging[: len(idx)]
        else:
            staging = None
        out = self._runtime.gather_rows(self.data, idx, staging)
        return out.reshape(len(idx), *self.shape[1:])

    def device_batch(self, idx: np.ndarray) -> Array:
        return jnp.asarray(self.gather(idx))


def get_dataset_any(config: Config, batch_size: int, train: bool = True):
    """Device-resident jnp array when it fits the HBM budget, else a
    HostResidentData wrapper."""
    arr = get_data_array(config, train=train)
    if arr.nbytes <= HBM_DATA_BUDGET_BYTES:
        return jnp.asarray(arr)
    return HostResidentData(arr, batch_size)


def get_data_generator(
    data: Array, batch_size: int, key: Optional[jax.Array] = None
) -> Generator[Array, None, None]:
    """Infinite shuffled minibatch generator over a device-resident dataset
    (API parity with the reference's DataLoader generator)."""
    key = jax.random.PRNGKey(0) if key is None else key
    n = data.shape[0]
    i = 0
    while True:
        idx = jax.random.randint(jax.random.fold_in(key, i), (batch_size,), 0, n)
        yield jnp.take(data, idx, axis=0)
        i += 1


def to_uint8(images, values_range: Tuple[float, float] = (-1.0, 1.0)) -> np.ndarray:
    a, b = values_range
    x = np.clip(np.asarray(images), a, b)
    return ((x - a) / (b - a) * 255.0).astype(np.uint8)


def compute_dataset_average(data: Array) -> Array:
    """Mean object over the dataset (streaming not needed: device-resident)."""
    return jnp.mean(data, axis=0)
