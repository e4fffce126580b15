"""CLI smoke tests: the scripts actually run end-to-end on CPU with tiny
synthetic workloads (subprocess, so the @with_config/argparse surface is
exercised for real)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run_script(name, *args, cwd=None, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize registers the TPU plugin whenever this var is
    # set, overriding JAX_PLATFORMS — drop it so smoke tests stay on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, name), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=cwd or REPO,
    )


def test_check_config():
    r = run_script("check_config.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "config OK" in r.stdout


def test_check_distance_and_analyze_fids(tmp_path):
    # synthesize a metric npz + a fid csv, then run the analysis CLIs
    np.savez(
        tmp_path / "m.npz",
        temp=np.logspace(-2, 2, 20),
        metric=np.linspace(1, 2, 20),
        log_temp=np.log(np.logspace(-2, 2, 20)),
    )
    r = run_script("check_distance.py", "--stats_path", str(tmp_path / "m.npz"),
                   cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "total arc length" in r.stdout
    assert "fraction accumulated" in r.stdout

    os.makedirs(tmp_path / "fid", exist_ok=True)
    with open(tmp_path / "fid" / "exp.csv", "w") as f:
        f.write("n_steps,schedule,min_temp,fid\n10,cosine,0.0001,5.0\n"
                "50,cosine,0.0001,2.0\n10,entropy,0.0001,3.0\n")
    r = run_script("analyze_fids.py", "--fid_dir", str(tmp_path / "fid"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cosine" in r.stdout and "entropy" in r.stdout


def test_analyze_stats(tmp_path):
    np.savez(
        tmp_path / "fwd.npz",
        temp=np.logspace(-2, 2, 20),
        entropy=np.tanh(np.linspace(-3, 3, 20)),
        free_energy=-np.logspace(-2, 2, 20),
        heat_capacity=np.exp(-np.linspace(-2, 2, 20) ** 2) + 0.01,
    )
    r = run_script(
        "analyze_stats.py", "--stats_path", str(tmp_path / "fwd.npz"),
        "--out", str(tmp_path / "out.png"), cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "out.png").exists()


@pytest.mark.slow
def test_sample_gmm_cpu(tmp_path):
    r = run_script("sample_gmm.py", cwd=str(tmp_path), timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MMD" in r.stdout


def test_sample_cli_custom_schedule(tmp_path):
    """sample.py with a custom knot schedule on the gmm1d analytic model —
    exercises with_config, scheduler factory, custom log_temp grid, npz
    output (and the >1-device sharded sampling path, since the CPU test
    env exposes 8 virtual devices)."""
    sched = np.linspace(np.log(1e-4), np.log(10.0), 8)
    np.savez(tmp_path / "sched.npz", log_temp=sched)
    r = run_script(
        "sample.py",
        "--dataset_name", "gmm1d",
        "--ddpm.model_name", "true",
        "--ddpm.parametrization", "x0",
        "--ddpm.noise_schedule_type", "log_snr",
        "--diffusion.min_temp", "1e-4", "--diffusion.max_temp", "1e1",
        "--sample.noise_schedule_type", "custom",
        "--sample.noise_schedule_path", str(tmp_path / "sched.npz"),
        "--sample.n_steps", "8",
        "--sample.n_samples", "64", "--sample.batch_size", "64",
        "--sample.step_type", "ddim",
        cwd=str(tmp_path), timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = np.load(tmp_path / "samples" / "gmm1d_true_8_ddim_steps.npz")
    x = out["x"].reshape(-1)
    assert x.shape == (64,)
    modes = np.array([-1.1, -0.9, 0.9, 1.1])
    assert np.quantile(np.abs(x[:, None] - modes[None]).min(1), 0.9) < 0.15


def test_stats_cli_sharded_matches_single_device(tmp_path):
    """compute_stats_forward.py with --parallel.data_axis 8 writes the same
    entropy curve as the single-device run (exact psum-merged sweep)."""
    outs = {}
    for ax in ("1", "8"):
        cwd = tmp_path / f"ax{ax}"
        (cwd / "stats").mkdir(parents=True)
        r = run_script(
            "compute_stats_forward.py", "--dataset_name", "gmm1d",
            "--forward_stats.n_samples", "64",
            "--forward_stats.batch_size", "64",
            "--forward_stats.n_temps", "6",
            "--parallel.data_axis", ax, "--parallel.model_axis", "1",
            cwd=str(cwd),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[ax] = np.load(cwd / "stats" / "gmm1d_forward.npz")
    np.testing.assert_allclose(
        outs["8"]["entropy"], outs["1"]["entropy"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        outs["8"]["heat_capacity"], outs["1"]["heat_capacity"],
        rtol=1e-3, atol=1e-5,
    )


def test_schedule_ordering_exp(tmp_path):
    r = run_script(
        "schedule_ordering_exp.py", "--dim", "8", "--n_data", "2000",
        "--n_eval", "256", "--n_temps", "12", "--steps", "5", "10",
        "--min_temp", "1e-4",
        cwd=str(tmp_path), timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "schedule_ordering.md").exists()
    assert "entropy" in r.stdout and "metric" in r.stdout


def test_prepare_data_and_cache_pickup(tmp_path):
    """prepare_data.py stages a fake MNIST idx file into a PDMC cache and
    the data layer consumes it (resize 28->32, uint8 -> [-1,1] CHW fp32)."""
    import gzip

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (40, 28, 28), dtype=np.uint8)
    raw = (2051).to_bytes(4, "big") + (40).to_bytes(4, "big") \
        + (28).to_bytes(4, "big") + (28).to_bytes(4, "big") + imgs.tobytes()
    src = tmp_path / "raw"
    src.mkdir()
    with gzip.open(src / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(raw)

    cache_dir = tmp_path / "cache"
    env_extra = {"PDM_DATA_CACHE": str(cache_dir)}

    env = dict(os.environ)
    env.update(env_extra)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "prepare_data.py"),
         "--dataset", "mnist", "--source", str(src), "--splits", "train"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (cache_dir / "mnist_train.pdmc").exists()

    code = (
        "import numpy as np\n"
        "from pdm_tpu.config.loader import load_config\n"
        "from pdm_tpu.utils.data import get_data_array\n"
        "cfg = load_config(); cfg.dataset_name = 'mnist'\n"
        "a = get_data_array(cfg, train=True, limit=8)\n"
        "assert a.shape == (8, 1, 32, 32), a.shape\n"
        "assert a.dtype == np.float32 and a.min() >= -1 and a.max() <= 1\n"
        "print('cache pickup OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cache pickup OK" in r.stdout


def test_export_sampler_cli(tmp_path):
    r = run_script(
        "export_sampler.py",
        "--dataset_name", "gmm1d",
        "--ddpm.model_name", "true",
        "--ddpm.parametrization", "x0",
        "--ddpm.noise_schedule_type", "log_snr",
        "--diffusion.min_temp", "1e-4", "--diffusion.max_temp", "1e1",
        "--sample.n_steps", "6", "--sample.batch_size", "32",
        "--sample.n_samples", "32", "--sample.step_type", "ddim",
        "--out", str(tmp_path / "gmm.stablehlo"),
        cwd=str(tmp_path), timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "gmm.stablehlo").exists()
    assert (tmp_path / "gmm.stablehlo.json").exists()
