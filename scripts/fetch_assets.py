"""One-command asset landing for real-image parity (VERDICT r3 #7).

Every BASELINE.md quality row needs external bytes this offline image
doesn't ship: MNIST/CIFAR-10 pixels, the FID-standard InceptionV3
weights, and the pretrained ``google/ddpm-cifar10-32`` UNet (reference
`diffusion/ddpm/diffusers_model.py:6-19`). This script is the single
documented command that stands between the repo and FID parity the day
those bytes exist:

    python fetch_assets.py                    # download (needs egress)
    python fetch_assets.py --source /mnt/dir  # land from a local mirror
    python fetch_assets.py --verify           # status table, no changes

For each asset it (a) obtains the raw files — direct download when the
environment has egress, otherwise a checksummed copy out of ``--source``
(searched recursively by filename) — (b) verifies the published digest,
and (c) post-processes into the exact form the framework consumes:

  mnist / cifar10   -> memory-mapped uint8 caches via prepare_data.py
                       ($PDM_DATA_CACHE/{name}_{split}.pdmc)
  inception         -> flax npz via pdm_tpu.models.inception converter
                       (point $PDM_INCEPTION_WEIGHTS at it)
  ddpm-cifar10      -> pretrained/ddpm-cifar10-32/{config.json,weights}
                       (the diffusers-import model factory's default dir)

Afterwards ``pytest tests/test_real_parity.py`` stops auto-skipping and
asserts the BASELINE.md rows (see that file for tolerances), and e.g.

    python compute_fid.py --dataset_name mnist

reproduces the reference protocol end to end.

Digests: MNIST idx and CIFAR-10 archive MD5s are the canonically
published values (yann.lecun.com / cs.toronto.edu). The FID Inception
checkpoint embeds the first 8 hex chars of its own SHA-256 in the
filename (torch-hub convention), which we check. The HF UNet weights
have no published digest — they are verified by conversion (every
tensor must map into the flax tree and match shapes).
"""
import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RAW = os.path.join(REPO, "assets", "raw")
DATA_CACHE = os.environ.get("PDM_DATA_CACHE", os.path.join(REPO, "data_cache"))
INCEPTION_NPZ = os.path.join(REPO, "assets", "inception_fid.npz")
PRETRAINED = os.path.join(REPO, "pretrained", "ddpm-cifar10-32")

# filename -> (urls, digest_kind, digest). Digest None = verified by use.
MANIFEST = {
    "mnist": {
        "train-images-idx3-ubyte.gz": (
            ["https://ossci-datasets.s3.amazonaws.com/mnist/train-images-idx3-ubyte.gz",
             "https://storage.googleapis.com/cvdf-datasets/mnist/train-images-idx3-ubyte.gz"],
            "md5", "f68b3c2dcbeaaa9fbdd348bbdeb94873"),
        "t10k-images-idx3-ubyte.gz": (
            ["https://ossci-datasets.s3.amazonaws.com/mnist/t10k-images-idx3-ubyte.gz",
             "https://storage.googleapis.com/cvdf-datasets/mnist/t10k-images-idx3-ubyte.gz"],
            "md5", "9fb629c4189551a2d022fa330f9573f3"),
        "train-labels-idx1-ubyte.gz": (
            ["https://ossci-datasets.s3.amazonaws.com/mnist/train-labels-idx1-ubyte.gz"],
            "md5", "d53e105ee54ea40749a09fcbcd1e9432"),
        "t10k-labels-idx1-ubyte.gz": (
            ["https://ossci-datasets.s3.amazonaws.com/mnist/t10k-labels-idx1-ubyte.gz"],
            "md5", "ec29112dd5afa0611ce80d1b7f02629c"),
    },
    "cifar10": {
        "cifar-10-python.tar.gz": (
            ["https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"],
            "md5", "c58f30108f718f92721af3b95e74349a"),
    },
    "inception": {
        "pt_inception-2015-12-05-6726825d.pth": (
            ["https://github.com/mseitzer/pytorch-fid/releases/download/"
             "fid_weights/pt_inception-2015-12-05-6726825d.pth",
             "https://github.com/toshas/torch-fidelity/releases/download/"
             "v0.2.0/weights-inception-2015-12-05-6726825d.pth"],
            "sha256_prefix", "6726825d"),
    },
    "ddpm-cifar10": {
        "config.json": (
            ["https://huggingface.co/google/ddpm-cifar10-32/resolve/main/unet/config.json"],
            None, None),
        "diffusion_pytorch_model.bin": (
            ["https://huggingface.co/google/ddpm-cifar10-32/resolve/main/"
             "unet/diffusion_pytorch_model.bin"],
            None, None),
        "scheduler_config.json": (
            ["https://huggingface.co/google/ddpm-cifar10-32/resolve/main/"
             "scheduler/scheduler_config.json"],
            None, None),
    },
}


def _digest_ok(path: str, kind, want) -> bool:
    if kind is None:
        return True
    h = hashlib.md5() if kind == "md5" else hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    got = h.hexdigest()
    if kind == "sha256_prefix":
        return got.startswith(want)
    return got == want


def _find_in_source(source: str, fname: str):
    """Recursive filename search; torch-fidelity's alternate inception
    filename is accepted for the canonical one."""
    names = {fname}
    if fname.startswith("pt_inception"):
        names.add("weights-inception-2015-12-05-6726825d.pth")
    for root, _dirs, files in os.walk(source):
        for n in names:
            if n in files:
                return os.path.join(root, n)
    return None


def _obtain(fname: str, spec, dest_dir: str, source) -> str:
    """Land one raw file into dest_dir, from --source or the network."""
    urls, kind, want = spec
    dest = os.path.join(dest_dir, fname)
    if os.path.exists(dest) and _digest_ok(dest, kind, want):
        return dest
    os.makedirs(dest_dir, exist_ok=True)
    if source:
        found = _find_in_source(source, fname)
        if found:
            shutil.copyfile(found, dest)
            if not _digest_ok(dest, kind, want):
                os.remove(dest)
                raise RuntimeError(f"{found}: {kind} mismatch (want {want})")
            return dest
    last = None
    for url in urls:
        try:
            print(f"  GET {url}")
            with urllib.request.urlopen(url, timeout=120) as r, open(
                dest, "wb"
            ) as f:
                shutil.copyfileobj(r, f)
            if not _digest_ok(dest, kind, want):
                raise RuntimeError(f"{kind} mismatch for {url}")
            return dest
        except Exception as e:  # noqa: BLE001 — try the next mirror
            last = e
    raise RuntimeError(
        f"could not obtain {fname}: no --source copy and downloads failed "
        f"(last error: {last})"
    )


def _postprocess(asset: str, files: dict) -> str:
    """Raw bytes -> the form the framework consumes. Returns landed path."""
    env = dict(os.environ, PDM_DATA_CACHE=DATA_CACHE,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    if asset in ("mnist", "cifar10"):
        src = os.path.dirname(next(iter(files.values())))
        if asset == "cifar10":
            tar = files["cifar-10-python.tar.gz"]
            if not os.path.isdir(os.path.join(src, "cifar-10-batches-py")):
                with tarfile.open(tar) as tf:
                    tf.extractall(src)  # noqa: S202 — checksummed archive
        subprocess.run(
            [sys.executable, os.path.join(HERE, "prepare_data.py"),
             "--dataset", asset, "--source", src],
            check=True, env=env, cwd=HERE,
        )
        if asset == "mnist":
            # label sidecars (for the LeNet-feature FID floor row)
            import gzip

            import numpy as np

            for split, prefix in (("train", "train"), ("test", "t10k")):
                p = files[f"{prefix}-labels-idx1-ubyte.gz"]
                with gzip.open(p, "rb") as f:
                    raw = f.read()
                assert int.from_bytes(raw[0:4], "big") == 2049
                labels = np.frombuffer(raw, np.uint8, offset=8)
                np.save(os.path.join(DATA_CACHE,
                                     f"mnist_{split}_labels.npy"), labels)
        return os.path.join(DATA_CACHE, f"{asset}_train.pdmc")
    if asset == "inception":
        subprocess.run(
            [sys.executable, os.path.join(HERE, "convert_inception_weights.py"),
             next(iter(files.values())), "--out", INCEPTION_NPZ],
            check=True, env=env, cwd=HERE,
        )
        return INCEPTION_NPZ
    if asset == "ddpm-cifar10":
        os.makedirs(PRETRAINED, exist_ok=True)
        os.makedirs(os.path.join(os.path.dirname(PRETRAINED), "ddpm-cifar10-32",
                                 "scheduler"), exist_ok=True)
        for fname, path in files.items():
            dst = (os.path.join(PRETRAINED, "scheduler", fname)
                   if fname == "scheduler_config.json"
                   else os.path.join(PRETRAINED, fname))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.abspath(path) != os.path.abspath(dst):
                shutil.copyfile(path, dst)
        # verified-by-use: every tensor must convert into the flax tree
        sys.path.insert(0, REPO)
        from pdm_tpu.models.diffusers_import import load_diffusers_unet

        load_diffusers_unet(os.path.join(PRETRAINED,
                                         "diffusion_pytorch_model.bin"))
        return PRETRAINED
    raise KeyError(asset)


def landed_status() -> dict:
    """What test_real_parity.py keys its skips on."""
    return {
        "mnist": os.path.exists(os.path.join(DATA_CACHE, "mnist_train.pdmc")),
        "cifar10": os.path.exists(
            os.path.join(DATA_CACHE, "cifar10_train.pdmc")),
        "inception": os.path.exists(
            os.environ.get("PDM_INCEPTION_WEIGHTS", INCEPTION_NPZ)),
        "ddpm-cifar10": os.path.exists(
            os.path.join(PRETRAINED, "diffusion_pytorch_model.bin")),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--assets", default=",".join(MANIFEST),
                    help="comma-list subset of: " + ", ".join(MANIFEST))
    ap.add_argument("--source", default=None,
                    help="local mirror dir to land from instead of the net")
    ap.add_argument("--verify", action="store_true",
                    help="print landed-status table and exit")
    args = ap.parse_args()

    if args.verify:
        status = landed_status()
        for k, ok in status.items():
            print(f"  {k:14s} {'LANDED' if ok else 'missing'}")
        sys.exit(0 if all(status.values()) else 1)

    results, failures = {}, {}
    for asset in args.assets.split(","):
        asset = asset.strip()
        print(f"[{asset}]")
        try:
            files = {
                fname: _obtain(fname, spec, os.path.join(RAW, asset),
                               args.source)
                for fname, spec in MANIFEST[asset].items()
            }
            results[asset] = _postprocess(asset, files)
            print(f"  landed -> {results[asset]}")
        except Exception as e:  # noqa: BLE001 — land the rest regardless
            failures[asset] = str(e)
            print(f"  FAILED: {e}")
    state = os.path.join(REPO, "assets", "LANDED.json")
    os.makedirs(os.path.dirname(state), exist_ok=True)
    with open(state, "w") as f:
        json.dump({"landed": results, "failed": failures}, f, indent=1)
    if results.get("inception"):
        print(f"\nexport PDM_INCEPTION_WEIGHTS={results['inception']}")
    if results.get("mnist") or results.get("cifar10"):
        print(f"export PDM_DATA_CACHE={DATA_CACHE}")
    print("next: python -m pytest tests/test_real_parity.py -v")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
