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


def _mesh_requested(config: Config) -> bool:
    """True when this run will execute under a multi-device mesh — the
    same decision mesh_from_config makes, without constructing a Mesh."""
    import jax as _jax

    par = getattr(config, "parallel", None)
    if par is None:
        return False
    model = max(1, int(par.model_axis))
    data = par.data_axis
    if data is None:
        return len(_jax.devices()) > 1 or model > 1
    return int(data) > 1 or model > 1


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
        # Mesh runs must use the XLA attention path: GSPMD cannot
        # partition the Mosaic custom call, so a batch-sharded step would
        # all-gather full activations around it (see UNet2D.fused_attention)
        if _mesh_requested(config):
            import dataclasses

            module = dataclasses.replace(
                module, fused_attention=False, fused_groupnorm=False
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

    if model_name == "diffusers":
        return diffusers_ddpm_from_config(config, scheduler)

    raise ValueError(f"Unknown model name: {model_name}")


def diffusers_ddpm_from_config(config: Config, scheduler) -> UNetDDPM:
    """The reference's third model family (DDPMDiffusers): a pretrained
    diffusers UNet2DModel, imported once from a LOCAL checkpoint dir
    (config.json + diffusion_pytorch_model.{safetensors,bin}; a 'unet/'
    subdir as in pipeline snapshots also works). Reference semantics:
    diffusion/ddpm/diffusers_model.py — tau rescaled by num_train_timesteps-1
    before the timestep embedding."""
    import json
    import os

    from .diffusers_import import load_diffusers_unet

    root = config.ddpm.diffusers_path or os.path.join(
        "pretrained", (config.dataset_config.diffusers_id or "").split("/")[-1]
    )
    base = os.path.join(root, "unet") if os.path.isdir(
        os.path.join(root, "unet")
    ) else root
    weights = None
    for fname in (
        "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
    ):
        p = os.path.join(base, fname)
        if os.path.exists(p):
            weights = p
            break
    if weights is None:
        raise FileNotFoundError(
            f"no diffusers UNet checkpoint under {base!r} (looked for "
            f"diffusion_pytorch_model.safetensors/.bin; set "
            f"--ddpm.diffusers_path)"
        )
    with open(os.path.join(base, "config.json")) as f:
        dcfg = json.load(f)
    dtype = jnp.bfloat16 if config.ddpm.precision == "bf16" else jnp.float32
    module = unet_from_config(
        config.dataset_config.channels, dcfg, dtype=dtype
    )
    params = load_diffusers_unet(weights)
    n_train = int(dcfg.get("num_train_timesteps", 1000) or 1000)
    sched_cfg = os.path.join(root, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_cfg):
        with open(sched_cfg) as f:
            n_train = int(json.load(f).get("num_train_timesteps", n_train))
    return UNetDDPM(
        scheduler=scheduler,
        params=params,
        module=module,
        parametrization=config.ddpm.parametrization,
        tau_scale=float(n_train - 1),
    )


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
