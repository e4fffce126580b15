"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY §4's test strategy for the
rebuild). Must set env vars before jax initializes.
"""

import os

# PDM_TPU_TESTS=1 leaves the real backend in place so the backend-gated
# hardware-parity tests (skipif default_backend() != "tpu") actually run;
# everything else in the suite still passes on the chip but is slow there.
_tpu_mode = os.environ.get("PDM_TPU_TESTS") == "1"

if not _tpu_mode:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _tpu_mode:
    # The environment's sitecustomize registers the axon TPU plugin and
    # forces jax_platforms="axon,cpu"; tests run on the virtual 8-device
    # CPU mesh by default.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


# ---------------------------------------------------------------------
# fast tier: `pytest -m fast` runs every module's core closed-form oracle
# in < 2 min on an 8-vCPU host (VERDICT r3 weak #3). Selection lives here
# (one list, nodeid prefixes) instead of 40 scattered decorators; anything
# slow-marked is excluded even if its prefix matches.
# ---------------------------------------------------------------------

FAST_NODES = [
    # L0/L1 core math: whole files are cheap (~27 s together)
    "test_schedulers.py",
    "test_boltzmann.py",
    "test_config.py",
    "test_coverage_gaps.py",
    "test_hypersphere_misc.py",
    # stats estimators: closed-form Gaussian/kNN oracles
    "test_stats.py::test_knn_matches_bruteforce",
    "test_stats.py::test_forward_stats_gaussian_entropy",
    "test_stats.py::test_metric_stats_regularization_floor",
    "test_stats.py::test_empirical_metric_sweep_vs_gaussian_closed_form",
    "test_stats.py::test_model_metric_matches_empirical_for_true_model",
    "test_stats.py::test_empirical_entropy_integration",
    # sampler: coefficient tables + one end-to-end GMM MMD
    "test_sampler.py::test_predictions_roundtrip",
    "test_sampler.py::test_discretize_schedule_grid",
    "test_sampler.py::test_heun_extreme_schedule_warns_at_construction",
    "test_sampler.py::test_track_states_shape_and_order",
    "test_sampler.py::test_gmm_sampling_mmd[ddim]",
    # pallas kernels (interpret mode) vs XLA oracles
    "test_attention.py::test_fused_forward_matches_reference",
    "test_attention.py::test_fused_vjp_matches_reference[2-128-2-64]",
    "test_attention.py::test_fused_block_forward_matches_reference",
    "test_groupnorm.py::test_fused_forward_matches_flax",
    "test_boltzmann_pallas.py::test_pallas_matches_xla[9-200-12]",
    "test_boltzmann_sweep.py::test_sweep_xla_matches_per_temp_op",
    # model / trainer structure (the convergence tests stay full-tier)
    "test_unet_trainer.py::test_reference_config_unet_builds",
    "test_unet_trainer.py::test_time_embedding_shapes_and_values",
    "test_unet_trainer.py::test_lr_schedule_parity",
    "test_unet_trainer.py::test_dropout_key_impls",
    # FID: moments + sqrtm oracles (Inception build stays full-tier)
    "test_fid.py::test_feature_statistics_streaming",
    "test_fid.py::test_sqrtm_matches_scipy",
    "test_fid.py::test_trace_sqrtm_rank_deficient",
    "test_fid.py::test_compute_fid_closure_discriminates",
    # parallel: mesh rules (the 8-device parity runs stay full-tier)
    "test_parallel.py::test_mesh_and_param_sharding_rules",
    "test_parallel.py::test_mesh_from_config",
    "test_parallel.py::test_sp_param_sharding_replicates_everything",
    # aux subsystems: one core check each
    "test_observability.py::test_csv_logger",
    "test_observability.py::test_phase_timer",
    "test_runtime.py::test_normalize_matches_numpy",
    "test_runtime.py::test_gather_rows_f32_and_u8",
    "test_diffusers_golden.py::test_golden_converter_outputs",
    "test_diffusers_import.py::test_convert_roundtrip_structure",
    "test_schedule_opt.py::test_gradients_flow_through_sampler",
    "test_sampler.py::test_compiler_options_bitwise_identical_samples",
]


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        rel = item.nodeid.split("/")[-1]
        if any(
            rel == n or rel.startswith(n + "::") or rel.startswith(n + "[")
            or (("::" in n) and rel.startswith(n))
            for n in FAST_NODES
        ) and "slow" not in item.keywords:
            item.add_marker(_pytest.mark.fast)
