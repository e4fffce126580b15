"""Model factory: build the configured DDPM (unet / true / diffusers-import)
with optional pretrained-checkpoint loading.

Capability parity: reference ``diffusion/ddpm/from_config.py``
(ddpm_from_config). The "diffusers" branch here means *weights imported
from a local torch checkpoint* rather than a live diffusers pipeline —
this stack is torch-free on the compute path and offline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config.config import Config
from ..schedulers.from_config import scheduler_from_config
from .base import DDPM, TrueDDPM
from .unet import unet_from_config
from .unet_ddpm import UNetDDPM, init_unet_ddpm


def ddpm_from_config(
    config: Config,
    pretrained: bool = False,
    key: Optional[jax.Array] = None,
) -> DDPM:
    scheduler = scheduler_from_config(config)
    model_name = config.ddpm.model_name
    parametrization = config.ddpm.parametrization

    if model_name == "unet":
        dtype = jnp.bfloat16 if config.ddpm.precision == "bf16" else jnp.float32
        module = unet_from_config(
            config.dataset_config.channels, config.ddpm.unet_config, dtype=dtype
        )
        ddpm = init_unet_ddpm(
            key if key is not None else jax.random.PRNGKey(0),
            scheduler,
            module,
            config.dataset_config.obj_size,
            parametrization=parametrization,
        )
        if pretrained:
            ddpm = load_pretrained_unet(ddpm, config)
        return ddpm

    if model_name == "true":
        from ..utils.data import get_data_tensor

        return TrueDDPM(
            scheduler=scheduler,
            train_data=get_data_tensor(config),
            parametrization=parametrization,
        )

    raise ValueError(f"Unknown model name: {model_name}")


def load_pretrained_unet(ddpm: UNetDDPM, config: Config) -> UNetDDPM:
    """Load the latest trained checkpoint for this experiment (EMA params),
    following the trainer's resume contract."""
    import os

    import orbax.checkpoint as ocp

    latest = os.path.join(config.checkpoint_dir, "latest.txt")
    if not os.path.exists(latest):
        raise FileNotFoundError(
            f"no checkpoint for experiment {config.experiment_name!r} "
            f"({latest} missing)"
        )
    with open(latest) as f:
        step = int(f.read().strip())
    path = os.path.abspath(os.path.join(config.checkpoint_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    return ddpm.with_params(
        jax.tree_util.tree_map(jnp.asarray, restored["ema_params"])
    )
