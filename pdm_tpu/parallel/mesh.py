"""Device mesh construction and sharding rules.

The framework's parallelism model (new capability — the reference is
single-accelerator, SURVEY §5):

* axis ``data``  — batch / MC-trajectory / dataset-N axis (pure DP or the
  sharded-dataset stats reductions)
* axis ``model`` — tensor parallelism over channel/head dimensions of the
  UNet (attention heads and wide conv channels shard over it)

Mesh axes lay out so ``data`` is outermost (DCN-ready) and ``model`` rides
ICI. On a single host this is one `Mesh` over all local devices; multi-host
entry goes through ``jax.distributed.initialize`` before building the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. ``data`` defaults to
    n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_config(
    parallel,
    devices: Optional[Sequence] = None,
    batch_size: Optional[int] = None,
    grad_accum: int = 1,
):
    """Mesh from a ``ParallelConfig`` (config.py), or None when the run is
    single-device with no parallelism requested.

    This is the one entry point the pipeline CLIs use, so a config with
    ``--parallel.data_axis 8`` behaves identically across train / sample /
    stats scripts.

    When ``data_axis`` is unset the 'data' axis is sized automatically to
    the visible devices; if ``batch_size`` is given, the auto size shrinks
    to the largest width that divides it (with a warning) instead of
    hard-failing later in check_batch_divisible — an *explicit* data_axis
    stays loud.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, int(parallel.model_axis))
    data = parallel.data_axis
    if data is None:
        if n == 1 and model == 1:
            return None
        if n % model != 0:
            raise ValueError(
                f"parallel.model_axis={model} does not divide the "
                f"{n} visible devices; set parallel.data_axis explicitly"
            )
        data = n // model
        # the quantity that must divide the data axis is the MICRO-batch
        # (batch_size // grad_accum) — the trainer splits each global
        # batch into grad_accum sequential micro-batches before sharding
        eff_batch = (
            None
            if batch_size is None
            else batch_size // max(1, int(grad_accum))
        )
        if eff_batch is not None and eff_batch % data != 0:
            import warnings

            best = max(
                d for d in range(1, data + 1) if eff_batch % d == 0
            )
            warnings.warn(
                f"auto mesh: micro-batch {eff_batch} (batch_size="
                f"{batch_size} / grad_accum={grad_accum}) is not divisible "
                f"by the {data} available data-parallel slots; using "
                f"data={best} (set parallel.data_axis to silence)",
                stacklevel=2,
            )
            data = best
        if data * model == 1:
            return None
    data = int(data)
    if data < 1 or model < 1 or data * model > n:
        raise ValueError(
            f"mesh data={data} x model={model} needs {data * model} devices "
            f"but only {n} are visible"
        )
    return make_mesh(data=data, model=model, devices=devices[: data * model])


def check_batch_divisible(batch_size: int, mesh: Mesh, what: str = "batch_size"):
    """Loud precondition for DP sharding (a bad size otherwise fails deep
    inside with_sharding_constraint with an opaque XLA error)."""
    ax = mesh.shape["data"]
    if batch_size % ax != 0:
        raise ValueError(
            f"{what}={batch_size} is not divisible by the mesh 'data' axis "
            f"({ax}); choose {what} a multiple of {ax} or shrink "
            f"parallel.data_axis"
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place an array (or pytree of arrays) batch-sharded on the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def _leaf_spec(path: Tuple, leaf, model_axis_size: int) -> P:
    """Tensor-parallel sharding rule for UNet parameters.

    Shard the widest channel dimension over 'model' where divisible:
    * conv kernels (H, W, Cin, Cout): shard Cout
    * dense kernels (Cin, Cout): shard Cout
    * biases / norm scales: replicate (small)
    The rule is conservative — anything not divisible stays replicated, so
    the same code runs on a model=1 mesh unchanged.
    """
    if leaf.ndim >= 2 and leaf.shape[-1] % model_axis_size == 0:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def _with_fsdp(spec: P, leaf, data_size: int) -> P:
    """Augment a model-partition spec with FSDP: shard the largest
    still-unsharded dimension divisible by the 'data' axis over 'data'
    (ZeRO-3 semantics — parameters, and hence EMA and optimizer moments,
    are stored 1/data_size per chip; GSPMD inserts the per-layer
    all-gather before use and reduce-scatters the gradients). Leaves with
    no divisible dimension (small norm scales) stay as-is — they are a
    negligible fraction of the footprint."""
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    cand = [
        (leaf.shape[i], i)
        for i in range(leaf.ndim)
        if entries[i] is None and leaf.shape[i] % data_size == 0
        and leaf.shape[i] >= data_size
    ]
    if not cand:
        return spec
    _, i = max(cand)
    entries[i] = "data"
    return P(*entries)


def params_sharding(
    params, mesh: Mesh, partition: str = "channel", fsdp: bool = False
):
    """NamedSharding pytree for model parameters.

    ``partition="channel"`` (tensor parallelism): output-channel dims over
    'model', replicated over 'data'. ``partition="spatial"``: parameters
    fully replicated — spatial parallelism shards *activations* (the H
    axis), so every chip needs the whole filter bank.

    ``fsdp=True`` additionally shards every parameter's largest remaining
    dimension over 'data' (fully-sharded data parallelism / ZeRO-3):
    per-chip parameter + Adam-moment + EMA memory drops by the 'data' axis
    size, at the cost of a per-layer weight all-gather that GSPMD overlaps
    with compute. Composes with both model partitions (with "channel" TP a
    conv kernel shards Cout over 'model' AND Cin over 'data')."""
    if partition == "spatial":
        base = jax.tree_util.tree_map(lambda leaf: P(), params)
    elif partition == "channel":
        m = mesh.shape["model"]
        base = jax.tree_util.tree_map_with_path(
            lambda path, leaf: _leaf_spec(path, leaf, m), params
        )
    else:
        raise ValueError(
            f"unknown model partition {partition!r} (channel|spatial)"
        )
    if fsdp:
        d = mesh.shape["data"]
        if d > 1:
            base = jax.tree_util.tree_map(
                lambda spec, leaf: _with_fsdp(spec, leaf, d), base, params,
                is_leaf=lambda x: isinstance(x, P),
            )
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), base,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(
    params, mesh: Mesh, partition: str = "channel", fsdp: bool = False
):
    return jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh),
        params,
        params_sharding(params, mesh, partition, fsdp=fsdp),
    )


def unet_with_tp(net, mesh: Mesh):
    """Copy of a UNet2D with tensor-parallel activation constraints.

    Channel axis of NHWC activations and the attention head axis shard
    over 'model' — together with the output-channel weight sharding
    (``params_sharding``) GSPMD keeps channel-sharded layouts through the
    convs (reduce-scatter on the Cin contraction) instead of
    all-gathering full activations. No-op on a model=1 mesh.
    """
    import dataclasses

    if mesh.shape["model"] <= 1:
        return net
    return dataclasses.replace(
        net,
        act_sharding=NamedSharding(mesh, P("data", None, None, "model")),
        head_sharding=NamedSharding(mesh, P("data", "model", None, None)),
    )


def unet_with_sp(net, mesh: Mesh):
    """Copy of a UNet2D with spatial-parallel (SP) activation constraints.

    The H axis of NHWC activations shards over 'model' while parameters
    stay replicated (``params_sharding(partition="spatial")``): GSPMD
    partitions every conv spatially and inserts the 3x3 halo exchanges as
    collective-permutes over ICI automatically (the scaling-book recipe —
    annotate shardings, let XLA insert collectives). GroupNorm spatial
    moments psum over 'model'; attention needs the full spatial extent, so
    GSPMD gathers H only at the (cheap, lowest-resolution) attention
    blocks. This is the memory axis for high-resolution models: the
    registry's celeba-hq 256x256 datasets (config/datasets.py, reference
    config/dataset_configs.py:102-128) have per-activation footprints
    model-axis-divisible by 8 down to the 32x32 attention level.

    ``head_sharding`` stays None: with H sharded, the head axis must NOT
    also shard over the same mesh axis. No-op on a model=1 mesh.
    """
    import dataclasses

    if mesh.shape["model"] <= 1:
        return net
    return dataclasses.replace(
        net,
        act_sharding=NamedSharding(mesh, P("data", "model", None, None)),
        head_sharding=None,
    )


def unet_with_model_parallel(net, mesh: Mesh, partition: str = "channel"):
    """Dispatch the 'model'-axis strategy: "channel" = tensor parallelism
    (unet_with_tp), "spatial" = spatial parallelism (unet_with_sp)."""
    if partition == "channel":
        return unet_with_tp(net, mesh)
    if partition == "spatial":
        return unet_with_sp(net, mesh)
    raise ValueError(f"unknown model partition {partition!r} (channel|spatial)")
