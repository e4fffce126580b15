"""Multi-host entry and data-parallel sampling helpers.

New capability vs the reference (single accelerator, SURVEY §5): multi-host
jobs initialize the JAX distributed runtime, then every host participates
in one global mesh with the 'data' axis laid out across hosts (DCN) and
'model' within a host (ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or cluster env vars. No-op on a
    single-process run."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def sharded_sampler(sampler, mesh: Mesh, partition: str = "data"):
    """A copy of the sampler sharded over the mesh.

    ``partition="data"``: the reverse-process batch axis shards over
    'data' (throughput-oriented; every step stays chip-local).

    ``partition="spatial"``: additionally shards the image H axis of the
    NCHW state over 'model' and applies the UNet's spatial-parallel
    activation constraints (mesh.unet_with_sp) — GSPMD halo-exchange
    convs over ICI. This is the LATENCY/MEMORY-oriented layout for
    high-resolution (256x256) models: a single reverse trajectory's
    activations spread over the 'model' axis instead of one chip.
    Requires a module-backed DDPM (UNetDDPM); the analytic TrueDDPM has
    no spatial structure to shard.

    The sampler always launches full ``batch_size`` batches (host-side
    truncation to n_samples), so batch_size is the only divisibility
    precondition — checked loudly here instead of failing deep inside
    with_sharding_constraint."""
    from .mesh import check_batch_divisible, unet_with_sp

    check_batch_divisible(sampler.batch_size, mesh, what="sample.batch_size")
    if partition == "data":
        return dataclasses.replace(
            sampler, batch_sharding=NamedSharding(mesh, P("data"))
        )
    if partition != "spatial":
        raise ValueError(
            f"unknown sampler partition {partition!r} (data|spatial)"
        )
    module = getattr(sampler.ddpm, "module", None)
    if module is None or not hasattr(module, "act_sharding"):
        raise ValueError(
            "spatial-parallel sampling needs a module-backed DDPM "
            "(UNetDDPM); this model has no spatial activations to shard"
        )
    from .mesh import replicated

    # params were typically committed to one device at init; replicate
    # them onto the mesh or the sharded xt constraint conflicts
    ddpm = dataclasses.replace(
        sampler.ddpm,
        module=unet_with_sp(module, mesh),
        params=jax.device_put(sampler.ddpm.params, replicated(mesh)),
    )
    # state is NCHW at the sampler level (bs, C, H, W): H is axis 2; the
    # module's NCHW->NHWC transpose carries the sharding into the UNet
    return dataclasses.replace(
        sampler,
        ddpm=ddpm,
        batch_sharding=NamedSharding(mesh, P("data", None, "model", None)),
    )
