"""Offline dress rehearsal of the real-image FID pipeline (VERDICT r2 #5).

The BASELINE.md quality rows need real CIFAR bytes and real Inception
weights, neither of which exists in this offline environment. This script
exercises every OTHER link of that chain end-to-end with stand-ins, so the
only thing left untested is the literal bytes of the real assets:

    fake raw CIFAR-10 pickles  ->  prepare_data.py   (PDMC uint8 cache)
    random-init InceptionV3    ->  PDM_INCEPTION_WEIGHTS npz
    train_diffusion.py          (short run, eval + FID + checkpoint)
    sample.py                   (pretrained load -> samples npz)
    compute_fid.py              (grid sweep -> fid/{exp}.csv)
    analyze_fids.py             (pivot table)

Everything runs in an isolated working directory (checkpoints/logs/fid
paths are cwd-relative), with the SAME CLI commands a user would run on
real data (reference pipeline: scripts/compute_fid.py:15-41).

    python dress_rehearsal.py [--workdir DIR] [--train-iters N]
                              [--fid-samples N] [--keep]
"""

import argparse
import json
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

TINY_UNET = json.dumps({
    "block_out_channels": [16, 32],
    "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
    "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
    "layers_per_block": 1,
    "attention_head_dim": 8,
    "dropout": 0.0,
    "norm_groups": 8,
})


def make_fake_cifar(raw_dir: str, n_train: int, n_test: int) -> None:
    """CIFAR-10 python-pickle layout with random image bytes."""
    os.makedirs(raw_dir, exist_ok=True)

    def batch(n, seed):
        r = np.random.RandomState(seed)
        return {
            b"data": r.randint(0, 256, (n, 3072)).astype(np.uint8),
            b"labels": r.randint(0, 10, n).tolist(),
        }

    per = max(n_train // 5, 1)
    for i in range(1, 6):
        with open(os.path.join(raw_dir, f"data_batch_{i}"), "wb") as f:
            pickle.dump(batch(per, i), f)
    with open(os.path.join(raw_dir, "test_batch"), "wb") as f:
        pickle.dump(batch(n_test, 99), f)


def make_standin_inception(path: str) -> None:
    """Random-init FID-standard InceptionV3 saved in the converter's npz
    format — stands in for the real torchvision weights byte-for-byte at
    the loader level (models/inception.py load_inception)."""
    import jax
    import jax.numpy as jnp

    from pdm_tpu.models.inception import InceptionV3Features, save_inception

    model = InceptionV3Features()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32), jnp.float32)
    )["params"]
    save_inception(params, path)


def run(cmd, cwd, env, label):
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    res = subprocess.run([sys.executable] + cmd, cwd=cwd, env=env)
    if res.returncode != 0:
        raise SystemExit(f"{label} failed (rc={res.returncode})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(HERE, "dress_rehearsal_tmp"))
    ap.add_argument("--train-iters", type=int, default=30)
    ap.add_argument("--fid-samples", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-test", type=int, default=64)
    ap.add_argument("--keep", action="store_true",
                    help="keep the working directory afterwards")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    if os.path.exists(wd):
        shutil.rmtree(wd)
    os.makedirs(wd)
    raw = os.path.join(wd, "raw")
    cache = os.path.join(wd, "cache")
    incep = os.path.join(wd, "inception_standin.npz")

    make_fake_cifar(raw, args.n_train, args.n_test)
    make_standin_inception(incep)

    env = dict(os.environ)
    env["PDM_DATA_CACHE"] = cache
    env["PDM_INCEPTION_WEIGHTS"] = incep
    env["PYTHONPATH"] = (
        HERE + os.pathsep + REPO + os.pathsep + env.get("PYTHONPATH", "")
    )

    common = [
        "--dataset_name", "cifar10",
        "--ddpm.model_name", "unet",
        "--ddpm.parametrization", "eps",
        "--ddpm.unet_config", TINY_UNET,
        "--ddpm.noise_schedule_type", "linear_beta",
    ]

    run(
        [os.path.join(HERE, "prepare_data.py"),
         "--dataset", "cifar10", "--source", raw],
        wd, env, "prepare_data",
    )
    for split in ("train", "test"):
        p = os.path.join(cache, f"cifar10_{split}.pdmc")
        assert os.path.exists(p), f"missing cache {p}"

    run(
        [os.path.join(HERE, "train_diffusion.py"), *common,
         "--ddpm_training.total_iters", str(args.train_iters),
         "--ddpm_training.batch_size", "16",
         "--ddpm_training.eval_steps", str(args.train_iters),
         "--ddpm_training.warmup_steps", "5",
         "--fid.samples", str(args.fid_samples)],
        wd, env, "train_diffusion",
    )

    run(
        [os.path.join(HERE, "sample.py"), *common,
         "--sample.noise_schedule_type", "linear_beta",
         "--sample.n_steps", "10",
         "--sample.n_samples", str(args.fid_samples),
         "--sample.batch_size", str(args.fid_samples),
         "--sample.step_type", "ddpm"],
        wd, env, "sample",
    )

    run(
        [os.path.join(HERE, "compute_fid.py"), *common,
         "--fid.samples", str(args.fid_samples),
         "--fid.n_steps", "[5, 10]",
         "--fid.noise_schedule_type", "[linear_beta, cosine]",
         "--fid.min_temp", "[1e-4]",
         "--fid.train", "--fid.sample", "--fid.required"],
        wd, env, "compute_fid",
    )

    run(
        [os.path.join(HERE, "analyze_fids.py"), "--fid_dir",
         os.path.join(wd, "fid")],
        wd, env, "analyze_fids",
    )

    # artifact assertions: the chain really produced the contract files
    import glob as _glob

    csvs = _glob.glob(os.path.join(wd, "fid", "*.csv"))
    assert csvs, "no FID csv produced"
    import csv as _csv

    with open(csvs[0]) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 4, f"expected 4 sweep rows, got {len(rows)}"
    assert all(float(r["fid"]) >= 0 and np.isfinite(float(r["fid"]))
               for r in rows), rows
    samples = _glob.glob(os.path.join(wd, "samples", "*.npz"))
    assert samples, "no samples npz"
    ckpts = _glob.glob(os.path.join(wd, "checkpoints", "*", "latest.txt"))
    assert ckpts, "no published checkpoint"

    print("\ndress rehearsal OK:")
    print(f"  cache:      {cache}")
    print(f"  checkpoint: {ckpts[0]}")
    print(f"  fid rows:   {[(r['schedule'], r['n_steps'], round(float(r['fid']), 2)) for r in rows]}")
    if not args.keep:
        shutil.rmtree(wd)


if __name__ == "__main__":
    main()
