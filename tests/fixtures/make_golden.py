"""Generate the committed diffusers-converter golden fixture.

Builds a tiny diffusers-layout state dict with deterministic random
values, converts it through ``diffusers_import.convert_unet_state_dict``,
applies the Flax UNet2D on fixed inputs, and writes BOTH the state dict
and the expected outputs. ``test_diffusers_golden.py`` then pins the whole
converter + UNet numerical path as a regression oracle: any change to the
weight mapping, layouts, or UNet math that alters outputs fails loudly.

True pretrained-diffusers parity additionally needs the real package /
weights (absent offline); the semantics the converter relies on (conv
padding, GroupNorm, SDPA attention, timestep embedding) are separately
cross-validated against torch in test_torch_semantics.py.

Run once from the repo root:
    JAX_PLATFORMS=cpu python tests/fixtures/make_golden.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
sys.path.insert(0, os.path.dirname(HERE))  # tests/ for test_diffusers_import

import jax
import jax.numpy as jnp
import numpy as np

from pdm_tpu.models.diffusers_import import convert_unet_state_dict
from pdm_tpu.models.unet import unet_from_config
from test_diffusers_import import synthesize_torch_sd

TINY = {
    "block_out_channels": [16, 32],
    "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
    "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
    "layers_per_block": 1,
    "attention_head_dim": 8,
    "dropout": 0.0,
    "freq_shift": 1,
    "flip_sin_to_cos": False,
    "downsample_padding": 0,
}


def build():
    import dataclasses

    net = unet_from_config(3, TINY)
    net = dataclasses.replace(net, norm_groups=4)
    x0 = jnp.zeros((2, 16, 16, 3))
    shapes = jax.eval_shape(
        lambda k: net.init(k, x0, jnp.zeros((2,)))["params"],
        jax.random.PRNGKey(0),
    )
    sd = synthesize_torch_sd(shapes)
    rng = np.random.RandomState(7)
    sd = {
        k: (rng.standard_normal(v.shape) * 0.08).astype(np.float32)
        for k, v in sd.items()
    }
    params = convert_unet_state_dict(sd)

    rng2 = np.random.RandomState(11)
    x = rng2.standard_normal((2, 16, 16, 3)).astype(np.float32)
    tau = np.asarray([0.125, 0.875], np.float32)
    out = net.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(tau),
        deterministic=True,
    )
    return sd, x, tau, np.asarray(out)


if __name__ == "__main__":
    sd, x, tau, out = build()
    np.savez(os.path.join(HERE, "diffusers_tiny_sd.npz"), **sd)
    np.savez(
        os.path.join(HERE, "diffusers_tiny_golden.npz"), x=x, tau=tau, out=out
    )
    print(f"wrote fixtures: {len(sd)} tensors, out shape {out.shape}")
