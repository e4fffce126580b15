"""UNet-backed DDPM model (the trainable flagship).

Bundles a Flax UNet2D module (static) with its parameters (pytree leaf), a
scheduler and a parametrization tag — passes through jit/scan like any
other model. Sampling uses deterministic (no-dropout) application.

Parity: reference ``diffusion/ddpm/unet.py`` (DDPMUnet); the NCHW<->NHWC
adapter keeps the framework-level object layout (B, C, H, W) identical to
the reference while the network computes in TPU-native NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from ..schedulers.base import Scheduler
from .base import DDPM
from .unet import UNet2D


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UNetDDPM(DDPM):
    scheduler: Scheduler
    params: Any
    module: UNet2D = dataclasses.field(metadata=dict(static=True))
    parametrization: str = dataclasses.field(
        default="eps", metadata=dict(static=True)
    )
    # timestep-input scale: natively-trained UNets take tau in [0, 1];
    # imported diffusers checkpoints were trained on integer timesteps
    # 0..N-1, so the importer sets N-1 here (the reference rescales tau by
    # timesteps.max() the same way, diffusers_model.py:12-16)
    tau_scale: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )

    def forward(self, xt: Array, tau: Array) -> Array:
        tau = jnp.broadcast_to(jnp.asarray(tau), (xt.shape[0],))
        if self.tau_scale != 1.0:
            tau = tau * self.tau_scale
        x_nhwc = jnp.transpose(xt, (0, 2, 3, 1))
        out = self.module.apply(
            {"params": self.params}, x_nhwc, tau, deterministic=True
        )
        return jnp.transpose(out, (0, 3, 1, 2)).astype(xt.dtype)

    def with_params(self, params: Any) -> "UNetDDPM":
        return dataclasses.replace(self, params=params)


def init_unet_ddpm(
    key: jax.Array,
    scheduler: Scheduler,
    module: UNet2D,
    obj_size,
    parametrization: str = "eps",
) -> UNetDDPM:
    """Initialize parameters with a dummy (B=1) forward.

    Initialization runs on CPU and transfers once: compiling the dozens of
    per-layer initializer kernels on the TPU (through the remote-compile
    tunnel) takes minutes, vs seconds on host.
    """
    c, h, w = obj_size
    dummy = jnp.zeros((1, h, w, c), jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(
            lambda k: module.init(k, dummy, jnp.zeros((1,), jnp.float32))[
                "params"
            ],
            device=cpu,
        )(jax.device_put(key, cpu))
    default = jax.devices()[0]
    params = jax.device_put(params, default)
    return UNetDDPM(
        scheduler=scheduler,
        params=params,
        module=module,
        parametrization=parametrization,
    )
