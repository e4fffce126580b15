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


def test_export_unet_with_fused_attention(tmp_path):
    """The UNet sampler graph contains the Mosaic attention custom call
    on TPU (ops/attention.py); jax.export must serialize and replay it.
    On CPU the kernel gate falls back to the einsum path, so this also
    covers the export of the plain UNet graph there."""
    import pytest

    from pdm_tpu.models.unet import UNet2D
    from pdm_tpu.models.unet_ddpm import UNetDDPM
    from pdm_tpu.ops.attention import use_fused_attention

    size = 16
    net = UNet2D(
        in_channels=3, out_channels=3, block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=8, dropout=0.0,
        norm_groups=8, dtype=jnp.bfloat16,
    )
    sched = LogSNRScheduler(1e-4, 1e1)
    shapes = jax.eval_shape(
        lambda k: net.init(
            k, jnp.zeros((2, size, size, 3)), jnp.zeros((2,))
        )["params"],
        jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.05, s.dtype
        ),
        shapes,
    )
    ddpm = UNetDDPM(scheduler=sched, params=params, module=net,
                    parametrization="eps")
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=4, obj_size=(3, size, size),
        batch_size=8, n_samples=8, step_type="ddim", precision="half",
    )
    path = str(tmp_path / "unet.stablehlo")
    try:
        export_sampler(sampler, path)
    except Exception as e:  # pragma: no cover - only if export regresses
        if jax.default_backend() == "tpu" and use_fused_attention(64, 64, 8):
            pytest.fail(f"UNet+Pallas-attention export regressed: {e}")
        raise
    fn, manifest = load_exported(path)
    got = np.asarray(fn(3))
    ref = np.asarray(
        sampler.batch_sample(jax.random.PRNGKey(jnp.uint32(3)))["x"]
    )
    assert got.shape == tuple(manifest["out_shape"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert np.all(np.isfinite(got))
