"""Serving export: the frozen StableHLO sampler replays the exact jitted
reverse process without any framework objects."""

import jax
import jax.numpy as jnp
import numpy as np

from pdm_tpu.diffusion.sampling import DDPMSampler
from pdm_tpu.models.base import TrueDDPM
from pdm_tpu.schedulers.analytic import LogSNRScheduler
from pdm_tpu.utils.serving import export_sampler, load_exported
from pdm_tpu.utils.synthetic import generate_gmm_1d


def test_export_roundtrip(tmp_path):
    data = jnp.asarray(generate_gmm_1d(20_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=6, obj_size=(1, 1, 1),
        batch_size=32, n_samples=32, step_type="ddim",
    )
    path = str(tmp_path / "gmm.stablehlo")
    export_sampler(sampler, path)

    fn, manifest = load_exported(path)
    assert manifest["n_steps"] == 6 and manifest["batch_size"] == 32

    got = np.asarray(fn(7))
    ref = np.asarray(
        sampler.batch_sample(jax.random.PRNGKey(jnp.uint32(7)))["x"]
    )
    assert got.shape == tuple(manifest["out_shape"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
