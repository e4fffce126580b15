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


def sharded_sampler(sampler, mesh: Mesh):
    """A copy of the sampler whose reverse-process batch axis is sharded
    over the mesh 'data' axis (every step stays chip-local).

    The sampler always launches full ``batch_size`` batches (host-side
    truncation to n_samples), so batch_size is the only divisibility
    precondition — checked loudly here instead of failing deep inside
    with_sharding_constraint."""
    from .mesh import check_batch_divisible

    check_batch_divisible(sampler.batch_size, mesh, what="sample.batch_size")
    return dataclasses.replace(
        sampler, batch_sharding=NamedSharding(mesh, P("data"))
    )
