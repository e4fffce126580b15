"""Parallelism: sharded sampling parity and mesh helpers on the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pdm_tpu.diffusion.sampling import DDPMSampler
from pdm_tpu.models.base import TrueDDPM
from pdm_tpu.parallel.distributed import sharded_sampler
from pdm_tpu.parallel.mesh import make_mesh, params_sharding, shard_batch
from pdm_tpu.schedulers.analytic import LogSNRScheduler
from pdm_tpu.utils.synthetic import generate_gmm_1d


def test_sharded_sampling_matches_unsharded():
    data = jnp.asarray(generate_gmm_1d(10_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=8, obj_size=(1, 1, 1),
        batch_size=64, n_samples=64, step_type="ddim",
    )
    ref = sampler.batch_sample(jax.random.PRNGKey(0))["x"]

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sh = sharded_sampler(sampler, mesh)
        got = sh.batch_sample(jax.random.PRNGKey(0))["x"]
    # deterministic DDIM with identical keys -> identical values
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_mesh_and_param_sharding_rules():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros((64,))},
        "norm": {"scale": jnp.zeros((33,))},
    }
    shardings = params_sharding(params, mesh)
    assert shardings["conv"]["kernel"].spec == P(None, None, None, "model")
    assert shardings["conv"]["bias"].spec == P()  # 1-D: replicated
    assert shardings["norm"]["scale"].spec == P()  # not divisible

    x = shard_batch(jnp.zeros((16, 3)), mesh)
    assert x.sharding.spec == P("data")


def test_thermo_sweep_sharded_matches():
    """thermo_sweep with the dataset axis sharded over the mesh equals the
    single-device sweep (same keys -> same noise -> exact psum merge)."""
    import numpy as np

    from pdm_tpu.stats.sweep import thermo_sweep

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(16 * 8, 6).astype(np.float32))
    temp = np.logspace(-1, 1, 5)
    mesh = make_mesh(data=8, model=1)
    ref = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=64,
                       batch_size=64)
    got = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=64,
                       batch_size=64, mesh=mesh)
    np.testing.assert_allclose(got["entropy"], ref["entropy"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["metric"], ref["metric"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        got["free_energy"], ref["free_energy"], rtol=1e-4, atol=1e-4
    )


def test_thermo_sweep_sharded_uneven_dataset():
    """N not divisible by the mesh data axis: the sharded sweep truncates
    the (< axis_size) remainder instead of erroring."""
    import numpy as np

    from pdm_tpu.stats.sweep import thermo_sweep

    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randn(16 * 8 + 5, 6).astype(np.float32))
    temp = np.logspace(-1, 1, 4)
    mesh = make_mesh(data=8, model=1)
    out = thermo_sweep(jax.random.PRNGKey(0), data, temp, n_samples=32,
                       batch_size=32, mesh=mesh)
    assert np.all(np.isfinite(out["entropy"]))
    assert np.all(np.isfinite(out["metric"]))
