"""Pre-stage real image datasets into PDMC caches.

The bench/offline environment has no network; the moment raw MNIST/CIFAR
copies are mounted anywhere, this one command builds the memory-mapped
uint8 caches the whole pipeline consumes (utils/data.py checks
``$PDM_DATA_CACHE/{dataset}_{split}.pdmc`` before the HF path), after
which every BASELINE.md row reproduces unchanged, e.g.:

    python prepare_data.py --dataset mnist --source /mnt/mnist
    python train_diffusion.py --dataset_name mnist
    python compute_fid.py --dataset_name mnist   # BASELINE.md rows 1-2

Supported raw sources (auto-detected under --source):
  * MNIST/Fashion-MNIST idx files ({train,t10k}-images-idx3-ubyte[.gz])
  * CIFAR-10 python pickles (cifar-10-batches-py/data_batch_*, test_batch)
  * .npz / .npy with an (N, H, W[, C]) uint8/float image array per split
  * a directory of {train,test}/*.png|jpg (PIL)

Images resize to the dataset's configured geometry with the native
runtime's bilinear kernel and store as NHWC uint8.
"""
import argparse
import glob
import gzip
import os
import pickle
import sys

import numpy as np

from _common import setup_jax  # noqa: F401  (keeps sys.path bootstrap)
from pdm_tpu import runtime
from pdm_tpu.config.datasets import DatasetRegistry


def _read_idx_images(path: str) -> np.ndarray:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        raw = f.read()
    magic = int.from_bytes(raw[0:4], "big")
    assert magic == 2051, f"not an idx3 image file: {path}"
    n = int.from_bytes(raw[4:8], "big")
    h = int.from_bytes(raw[8:12], "big")
    w = int.from_bytes(raw[12:16], "big")
    return np.frombuffer(raw, np.uint8, n * h * w, 16).reshape(n, h, w, 1)


def _load_split(source: str, split: str) -> np.ndarray:
    """(N, H, W, C) uint8 for one split, auto-detecting the source kind."""
    # idx (MNIST family)
    prefix = "train" if split == "train" else "t10k"
    for suffix in ("", ".gz"):
        p = os.path.join(source, f"{prefix}-images-idx3-ubyte{suffix}")
        if os.path.exists(p):
            return _read_idx_images(p)
    # CIFAR-10 python pickles
    cdir = os.path.join(source, "cifar-10-batches-py")
    if os.path.isdir(cdir) or os.path.exists(
        os.path.join(source, "data_batch_1")
    ):
        base = cdir if os.path.isdir(cdir) else source
        names = (
            [f"data_batch_{i}" for i in range(1, 6)]
            if split == "train"
            else ["test_batch"]
        )
        chunks = []
        for nm in names:
            with open(os.path.join(base, nm), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            arr = np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32)
            chunks.append(arr.transpose(0, 2, 3, 1))
        return np.concatenate(chunks)
    # npz / npy
    for ext in ("npz", "npy"):
        p = os.path.join(source, f"{split}.{ext}")
        if os.path.exists(p):
            if ext == "npy":
                arr = np.load(p)
            else:
                z = np.load(p)
                key = "images" if "images" in z else list(z.keys())[0]
                arr = z[key]
            if arr.dtype != np.uint8:
                arr = np.asarray(arr, np.float64)
                if arr.size and arr.max() <= 1.0 + 1e-6:
                    # float image conventions: [-1, 1] or [0, 1]
                    if arr.min() < -1e-3:
                        arr = (arr + 1.0) * 127.5
                    else:
                        arr = arr * 255.0
                arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
            if arr.ndim == 3:
                arr = arr[..., None]
            return arr
    # image folder
    folder = os.path.join(source, split)
    files = sorted(
        glob.glob(os.path.join(folder, "*.png"))
        + glob.glob(os.path.join(folder, "*.jpg"))
    )
    if files:
        from PIL import Image

        imgs = [np.asarray(Image.open(f).convert("RGB")) for f in files]
        return np.stack(imgs).astype(np.uint8)
    raise FileNotFoundError(
        f"no recognizable {split} data under {source} "
        "(idx / cifar pickles / npz / image folder)"
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="registered dataset name (mnist, cifar10, ...)")
    p.add_argument("--source", required=True,
                   help="directory holding the raw downloaded files")
    p.add_argument("--splits", nargs="+", default=["train", "test"])
    args = p.parse_args()

    cfg = DatasetRegistry.get(args.dataset)
    out_dir = os.environ.get("PDM_DATA_CACHE", "data_cache")
    os.makedirs(out_dir, exist_ok=True)

    for split in args.splits:
        imgs = _load_split(args.source, split)
        h, w = cfg.image_size
        if imgs.shape[3] != cfg.channels:
            if cfg.channels == 1:
                imgs = imgs.mean(axis=3, keepdims=True).astype(np.uint8)
            else:
                imgs = np.repeat(imgs, cfg.channels, axis=3)
        if imgs.shape[1:3] != (h, w):
            imgs = runtime.resize_bilinear_u8(imgs, h, w)
        path = os.path.join(out_dir, f"{args.dataset}_{split}.pdmc")
        runtime.write_cache(path, np.ascontiguousarray(imgs))
        print(f"{split}: {imgs.shape} uint8 -> {path}")
    print(
        "done — the pipeline CLIs now pick these up automatically "
        f"(PDM_DATA_CACHE={out_dir})"
    )


if __name__ == "__main__":
    main()
