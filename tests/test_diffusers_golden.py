"""Golden-fixture pin of the diffusers converter + UNet numerical path.

tests/fixtures/diffusers_tiny_sd.npz is a committed diffusers-layout state
dict (random weights, generated once by fixtures/make_golden.py);
diffusers_tiny_golden.npz holds the expected UNet outputs. Any change to
the weight mapping, tensor layouts, or UNet forward math that perturbs
outputs fails this test. (diffusers ref semantics pinned here:
/root/reference/diffusion/ddpm/unet.py:12-31 — freq_shift=1,
flip_sin_to_cos=False, downsample_padding=0.)
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from pdm_tpu.models.diffusers_import import convert_unet_state_dict
from pdm_tpu.models.unet import unet_from_config

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def test_golden_converter_outputs():
    from fixtures.make_golden import TINY  # single source for the config

    sd = dict(np.load(os.path.join(FIX, "diffusers_tiny_sd.npz")))
    golden = np.load(os.path.join(FIX, "diffusers_tiny_golden.npz"))

    net = unet_from_config(3, TINY)
    net = dataclasses.replace(net, norm_groups=4)
    params = convert_unet_state_dict(sd)
    out = net.apply(
        {"params": params},
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["tau"]),
        deterministic=True,
    )
    # tolerance covers XLA-CPU reduction-reassociation drift between the
    # generating process and the test env (~5e-4 through 10+ conv layers);
    # a mapping/layout/math regression produces O(1) mismatches
    np.testing.assert_allclose(
        np.asarray(out), golden["out"], rtol=5e-3, atol=5e-3
    )
    # and the outputs must be non-degenerate (a broken converter that
    # zeroes a branch could otherwise slip under a loose tolerance)
    assert float(np.abs(golden["out"]).mean()) > 1e-3
