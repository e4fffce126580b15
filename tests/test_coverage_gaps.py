"""Coverage for remaining branches: diffusers schedule type, dataset-size
dispatch, multihost no-op, sampler n_samples truncation, config env
override."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_diffusers_schedule_from_local_table(tmp_path, monkeypatch):
    """noise_schedule_type='diffusers' reads a local alphas_cumprod table
    (the offline contract replacing the live pipeline load)."""
    from pdm_tpu.config.loader import load_config
    from pdm_tpu.schedulers.from_config import scheduler_from_config
    from pdm_tpu.schedulers.interpolated import InterpolatedScheduler

    cfg = load_config()  # cifar10: diffusers_model_id ./checkpoints/ddpm_ema_cifar10
    model_dir = tmp_path / "checkpoints" / "ddpm_ema_cifar10"
    os.makedirs(model_dir)
    betas = np.linspace(1e-4, 2e-2, 1000)
    np.savez(model_dir / "alphas_cumprod.npz",
             alphas_cumprod=np.cumprod(1 - betas).astype(np.float32))
    monkeypatch.chdir(tmp_path)
    sched = scheduler_from_config(cfg, noise_schedule_type="diffusers")
    assert isinstance(sched, InterpolatedScheduler)
    lt = np.asarray(sched.log_temp_from_tau(jnp.asarray([0.0, 1.0])))
    assert lt[0] < -8 and lt[1] > 3  # spans the DDPM range


def test_get_dataset_any_dispatch(monkeypatch):
    from pdm_tpu.config.loader import load_config
    from pdm_tpu.utils import data as data_mod

    cfg = load_config()
    cfg.dataset_name = "gmm1d"
    # small budget forces the host-resident path
    monkeypatch.setattr(data_mod, "HBM_DATA_BUDGET_BYTES", 1024)
    host = data_mod.get_dataset_any(cfg, batch_size=8)
    assert isinstance(host, data_mod.HostResidentData)
    batch = host.device_batch(np.arange(8))
    assert batch.shape == (8, 1, 1, 1)
    # large budget -> device array
    monkeypatch.setattr(data_mod, "HBM_DATA_BUDGET_BYTES", 1 << 40)
    dev = data_mod.get_dataset_any(cfg, batch_size=8)
    assert hasattr(dev, "devices")


def test_initialize_multihost_noop():
    from pdm_tpu.parallel.distributed import initialize_multihost

    initialize_multihost()  # single-process: must be a no-op
    assert jax.process_count() == 1


def test_sampler_truncates_to_n_samples():
    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.schedulers.analytic import LogSNRScheduler
    from pdm_tpu.utils.synthetic import generate_gmm_1d

    data = jnp.asarray(generate_gmm_1d(2_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=4, obj_size=(1, 1, 1),
        batch_size=32, n_samples=70, step_type="ddim", track_states=True,
    )
    out = sampler.sample(jax.random.PRNGKey(0))
    assert out["x"].shape == (70, 1, 1, 1)
    assert out["states"].shape == (4, 70, 1, 1, 1)


def test_config_env_override(tmp_path, monkeypatch):
    import yaml

    from pdm_tpu.config.loader import DEFAULT_CONFIG_PATH, load_config

    root = yaml.safe_load(open(DEFAULT_CONFIG_PATH))
    # materialize groups inline for a self-contained file
    base = os.path.dirname(DEFAULT_CONFIG_PATH)
    for k, v in list(root.items()):
        if isinstance(v, str) and v.endswith(".yaml"):
            root[k] = yaml.safe_load(open(os.path.join(base, v)))
    root["dataset_name"] = "mnist"
    alt = tmp_path / "alt.yaml"
    alt.write_text(yaml.dump(root))
    monkeypatch.setenv("PDM_CONFIG", str(alt))
    cfg = load_config()
    assert cfg.dataset_name == "mnist"
