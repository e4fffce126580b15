"""Thermodynamic sweeps over noise levels — free energy, entropy, heat
capacity, and the empirical Fisher-Rao metric, in ONE fused pass per
temperature.

Physics (linear / variance-exploding convention, matching the reference's
stats pipelines): noise the data as ``xt = x0 + sqrt(T) eps``; the Boltzmann
posterior over the dataset at temperature T gives

    F(T)  = -T E[log Z]                    (free energy)
    S(T)  = E[log Z + U/T] - log N          (entropy)
    C(T)  = Var_p[H/T]                      (heat capacity, = dS/dlogT)
    G(T)  = Var_p[H/T]                      (empirical Fisher-Rao metric in
                                             lambda = log T — the same
                                             posterior-energy variance)

The reference computes S and G in two separate passes over the dataset
(utils/stats.py:261-311 and :14-111); here one streaming Boltzmann-moments
evaluation yields all four. Optional metric regularization (global floor or
adaptive k-NN sigma^2, stats.py:42-108) rides the op's ``values`` channel:
the posterior-weighted per-point sigma^2 is just E_p[values].

MC protocol parity: ``n_samples`` trajectory starts drawn from the data
generator, batched; ONE shared noise draw per batch reused across all
temperatures (common random numbers — this is what lets the fused sweep
kernel decompose the energy as C0 + sqrt(T) D0 + T e^2 and visit the
dataset once for every temperature; estimates are therefore correlated
across temperatures, which smooths S(T)/C(T) curves but means per-temp
errors are not independent); batch means averaged.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops.boltzmann import boltzmann_moments_xla


@partial(
    jax.jit, static_argnames=("with_knn", "axis_name", "n_true")
)
def _sweep_batch(
    key: jax.Array,
    x0: Array,  # (B, D) trajectory starts
    data: Array,  # (N, D), or the local shard when axis_name is set
    temp: Array,  # (n_temps,)
    sigma_reg_sq: Optional[Array],  # (N,) per-point adaptive sigma^2 or None
    with_knn: bool = False,
    axis_name: Optional[str] = None,
    prep_pack=None,  # (y_hi, y_lo|None, ysq) from prepare_y, or None
    n_true: Optional[int] = None,
) -> Dict[str, Array]:
    """Per-batch sweep over all temperatures with a SHARED noise draw per
    trajectory (common random numbers): every per-temperature estimate is
    unbiased and the whole sweep costs two Grams instead of one per
    temperature (ops/boltzmann_sweep.py). On TPU the fused Pallas kernel
    runs the per-temperature epilogues on VMEM-resident Gram blocks
    (~15-20x over the per-temperature path at CIFAR scale); elsewhere the
    XLA per-temperature pass is used with the same shared noise. With
    ``axis_name`` set (under shard_map), ``data`` is this chip's dataset
    shard and the accumulators psum-merge across the mesh."""
    from ..ops.boltzmann_sweep import boltzmann_sweep

    n_objects = data.shape[0]
    if axis_name is not None:
        n_objects = n_objects * jax.lax.axis_size(axis_name)
    values = sigma_reg_sq[:, None] if with_knn else None
    eps = jax.random.normal(key, x0.shape)

    if axis_name is not None:
        from ..ops.boltzmann_sweep import boltzmann_sweep_shard_body

        mom = boltzmann_sweep_shard_body(
            x0, eps, data, temp, values=values, axis_name=axis_name
        )
    else:
        y_arg = data
        if prep_pack is not None:
            from ..ops.boltzmann_pallas import PreparedY

            y_hi, y_lo, ysq = prep_pack
            y_arg = PreparedY(y_hi, y_lo, ysq, n_true, data.shape[1])
        # mxu_precision=None resolves the env-var policy at CALL time
        # (PDM_SWEEP_PRECISION > PDM_BOLTZMANN_PRECISION > fp32), keeping
        # the one-knob contract with boltzmann_moments/knn even if the
        # env changes after import
        mom = boltzmann_sweep(x0, eps, y_arg, temp, values=values)

    t_col = temp[:, None]
    return {
        "entropy": jnp.mean(mom.entropy(n_objects), axis=1),
        "free_energy": jnp.mean(-t_col * mom.log_z, axis=1),
        "var_g": mom.var,  # (n_temps, B) posterior energy/T variance
        "log_z": mom.log_z,
        "sigma_eff": (
            mom.mean[:, :, 0] if with_knn else jnp.zeros_like(mom.var)
        ),
    }


def _regularized_metric(
    var_g: np.ndarray,  # (n_temps, B)
    temp: np.ndarray,
    regularize: bool,
    sigma_eff: Optional[np.ndarray],
    global_sigma_reg_sq: float,
) -> np.ndarray:
    """Apply the manifold-regularization floor per (temp, sample), then
    average over samples. G_reg = 0.5 s2 (s2 + 2T) / (s2 + T)^2 — the metric
    of a Gaussian cluster of variance s2 (reference stats.py:97-108)."""
    if not regularize:
        return var_g.mean(axis=1)
    t = temp[:, None]
    s2 = sigma_eff if sigma_eff is not None else global_sigma_reg_sq
    g_reg = 0.5 * s2 * (s2 + 2 * t) / (s2 + t) ** 2
    return np.maximum(var_g, g_reg).mean(axis=1)


def thermo_sweep(
    key: jax.Array,
    data: Array,
    temp: np.ndarray,
    n_samples: int = 1024,
    batch_size: int = 1024,
    *,
    regularize: bool = False,
    adaptive_knn: bool = False,
    knn_k: int = 5,
    sigma_reg_scale: float = 1.0,
    global_sigma_reg_sq: float = 1e-3,
    mesh=None,
    stream_chunk: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Full MC sweep: entropy, free energy, heat capacity, metric.

    ``data`` device-resident (N, ...) array; trajectory starts are drawn
    uniformly from it (the reference's infinite shuffled generator).
    Returns the union of both reference artifact contracts:
    temp / entropy / free_energy / heat_capacity / metric / log_temp /
    dataset_tr_sigma0.

    ``stream_chunk``: host-streaming tier for datasets larger than HBM
    (the reference walks these with a dataloader, utils/stats.py:276-280).
    ``data`` stays a host numpy array; each MC batch visits it in
    device-resident chunks of this many points through the fused sweep
    kernel, and the per-chunk moments combine with the exact
    shift-stabilized merge (ops/boltzmann.merge_moments — the same math
    as the multi-chip psum path). Mutually exclusive with ``mesh`` and
    ``adaptive_knn`` (the k-NN graph needs the dataset on device).
    """
    if stream_chunk is not None:
        if mesh is not None or adaptive_knn:
            raise ValueError(
                "stream_chunk is a single-device host-streaming path; "
                "it cannot combine with mesh= or adaptive_knn"
            )
        return _thermo_sweep_streamed(
            key, data, temp, n_samples, batch_size, stream_chunk,
            regularize=regularize,
            global_sigma_reg_sq=global_sigma_reg_sq,
        )
    data2d = jnp.reshape(data, (data.shape[0], -1))
    n, d = data2d.shape
    temp_j = jnp.asarray(temp, jnp.float32)

    sigma_reg_sq = None
    with_knn = bool(regularize and adaptive_knn)
    if with_knn:
        from ..ops.knn import knn_sqdist
        from ..ops.precision import boltzmann_precision_mode

        d_k = knn_sqdist(
            data2d, k=knn_k, mxu_precision=boltzmann_precision_mode()
        )  # (N,) squared k-NN distance
        sigma_reg_sq = d_k * (sigma_reg_scale / float(d))

    entropy_acc = []
    free_energy_acc = []
    var_chunks = []
    sigma_chunks = []
    seen = 0
    bi = 0
    sweep_fn = _sweep_batch
    data_sharded = data2d

    # single-device TPU path: pay the dataset pad/split/norm once for the
    # whole sweep (the fused kernel consumes the prepared pack)
    prep_pack, n_true = None, None
    if (
        mesh is None
        and jax.default_backend() == "tpu"
        # respect the env opt-out: the XLA sweep path consumes the raw
        # dataset array, not a PreparedY pack
        and os.environ.get("PDM_SWEEP_IMPL", "pallas") != "xla"
    ):
        from ..ops.boltzmann_pallas import prepare_y
        from ..ops.boltzmann_sweep import sweep_precision_mode

        prep = prepare_y(data2d, sweep_precision_mode())
        prep_pack, n_true = (prep.y_hi, prep.y_lo, prep.ysq), prep.n
    if mesh is not None:
        # dataset axis sharded over the mesh 'data' axis: each chip streams
        # its shard and the online-softmax accumulators psum-merge exactly.
        # shard_map needs equal shards; drop the (< axis_size) remainder —
        # negligible for an MC estimator over >= thousands of points.
        from jax.sharding import PartitionSpec as P

        ax = mesh.shape["data"]
        n_keep = (n // ax) * ax
        if n_keep != n:
            data_sharded = data2d[:n_keep]
            if sigma_reg_sq is not None:
                sigma_reg_sq = sigma_reg_sq[:n_keep]

        sweep_fn = jax.jit(
            jax.shard_map(
                lambda k, x0, dd, tt, sg: _sweep_batch(
                    k, x0, dd, tt, sg, with_knn, axis_name="data"
                ),
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P(), P("data") if with_knn else P()),
                out_specs=P(),
                check_vma=False,
            )
        )

    while seen < n_samples:
        bs = min(batch_size, n_samples - seen)
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        x0 = data2d[idx]
        if mesh is not None:
            out = sweep_fn(
                jax.random.fold_in(key, bi), x0, data_sharded, temp_j,
                sigma_reg_sq,
            )
        else:
            out = sweep_fn(
                jax.random.fold_in(key, bi), x0, data2d, temp_j, sigma_reg_sq,
                with_knn, prep_pack=prep_pack, n_true=n_true,
            )
        entropy_acc.append(np.asarray(out["entropy"]) * bs)
        free_energy_acc.append(np.asarray(out["free_energy"]) * bs)
        var_chunks.append(np.asarray(out["var_g"]))
        sigma_chunks.append(np.asarray(out["sigma_eff"]))
        seen += bs
        bi += 1

    entropy = np.sum(entropy_acc, axis=0) / seen
    free_energy = np.sum(free_energy_acc, axis=0) / seen
    var_g = np.concatenate(var_chunks, axis=1)  # (n_temps, n_samples)
    sigma_eff = np.concatenate(sigma_chunks, axis=1) if with_knn else None

    metric = _regularized_metric(
        var_g, np.asarray(temp, np.float64), regularize, sigma_eff,
        global_sigma_reg_sq,
    )
    tr_sigma0 = float(np.asarray(jnp.var(data2d, axis=0, ddof=1).sum()))

    return {
        "temp": np.asarray(temp),
        "entropy": entropy,
        "free_energy": free_energy,
        "heat_capacity": var_g.mean(axis=1),
        "metric": metric,
        "log_temp": np.log(np.asarray(temp)),
        "dataset_tr_sigma0": np.asarray(tr_sigma0),
    }


def _thermo_sweep_streamed(
    key: jax.Array,
    data,  # host np.ndarray (N, ...) — never fully device-resident
    temp: np.ndarray,
    n_samples: int,
    batch_size: int,
    stream_chunk: int,
    *,
    regularize: bool,
    global_sigma_reg_sq: float,
) -> Dict[str, np.ndarray]:
    """>HBM dataset tier of thermo_sweep: device-resident chunks through
    the fused sweep kernel, per-chunk moments combined with the exact
    shift-stabilized merge. The shared noise draw per MC batch (common
    random numbers) is reused across chunks AND temperatures, so the
    result is numerically the single-shot sweep up to fp rounding — see
    tests/test_stats.py::test_thermo_sweep_streamed_matches_device."""
    from ..ops.boltzmann import merge_moments
    from ..ops.boltzmann_sweep import boltzmann_sweep

    data_np = np.reshape(np.asarray(data), (np.asarray(data).shape[0], -1))
    n, d = data_np.shape
    temp_j = jnp.asarray(temp, jnp.float32)

    sweep_jit = jax.jit(
        lambda x0, eps, y: boltzmann_sweep(x0, eps, y, temp_j)
    )
    merge = merge_moments  # jitted

    entropy_acc, free_energy_acc, var_chunks = [], [], []
    # dataset trace-of-covariance, streamed in float64 (one pass)
    s1 = np.zeros(d, np.float64)
    s2 = np.zeros(d, np.float64)
    for off in range(0, n, stream_chunk):
        c = data_np[off : off + stream_chunk].astype(np.float64)
        s1 += c.sum(axis=0)
        s2 += np.square(c).sum(axis=0)
    tr_sigma0 = float(((s2 - np.square(s1) / n) / (n - 1)).sum())

    # Draw every MC batch's trajectory starts and shared noise up front
    # (n_samples x D fp32 — e.g. 100 MB for 2000 image-net-64 starts),
    # then iterate CHUNK-OUTER / batch-inner: the dataset crosses
    # host->device exactly once for the whole sweep instead of once per
    # MC batch, and each chunk's device upload (and Pallas prepare) is
    # amortized over all batches.
    batches = []  # [(x0, eps, bs)]
    seen = 0
    bi = 0
    while seen < n_samples:
        bs = min(batch_size, n_samples - seen)
        key, sub = jax.random.split(key)
        idx = np.asarray(jax.random.randint(sub, (bs,), 0, n))
        x0 = jnp.asarray(data_np[idx], jnp.float32)
        eps = jax.random.normal(jax.random.fold_in(key, bi), x0.shape)
        batches.append((x0, eps, bs))
        seen += bs
        bi += 1

    moms = [None] * len(batches)
    for off in range(0, n, stream_chunk):
        y = jnp.asarray(data_np[off : off + stream_chunk], jnp.float32)
        for i, (x0, eps, _) in enumerate(batches):
            m = sweep_jit(x0, eps, y)
            moms[i] = m if moms[i] is None else merge(moms[i], m)

    for mom, (_, _, bs) in zip(moms, batches):
        entropy_acc.append(
            np.asarray(jnp.mean(mom.entropy(n), axis=1)) * bs
        )
        free_energy_acc.append(
            np.asarray(jnp.mean(-temp_j[:, None] * mom.log_z, axis=1)) * bs
        )
        var_chunks.append(np.asarray(mom.var))

    entropy = np.sum(entropy_acc, axis=0) / seen
    free_energy = np.sum(free_energy_acc, axis=0) / seen
    var_g = np.concatenate(var_chunks, axis=1)
    metric = _regularized_metric(
        var_g, np.asarray(temp, np.float64), regularize, None,
        global_sigma_reg_sq,
    )
    return {
        "temp": np.asarray(temp),
        "entropy": entropy,
        "free_energy": free_energy,
        "heat_capacity": var_g.mean(axis=1),
        "metric": metric,
        "log_temp": np.log(np.asarray(temp)),
        "dataset_tr_sigma0": np.asarray(tr_sigma0),
    }


def forward_stats(
    key: jax.Array, data: Array, temp: np.ndarray, n_samples: int = 1024,
    batch_size: int = 1024, *, mesh=None, stream_chunk: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Reference forward-stats artifact contract: {temp, entropy}.

    Parity: utils/stats.py compute_stats + scripts/compute_stats_forward.py.
    ``mesh``: shard the dataset axis over the mesh 'data' axis.
    ``stream_chunk``: host-streaming tier for >HBM datasets (thermo_sweep).
    """
    out = thermo_sweep(
        key, data, temp, n_samples, batch_size, mesh=mesh,
        stream_chunk=stream_chunk,
    )
    # superset of the reference contract: consumers key on temp/entropy,
    # the extra thermodynamic curves come free from the fused sweep
    return {
        "temp": out["temp"],
        "entropy": out["entropy"],
        "free_energy": out["free_energy"],
        "heat_capacity": out["heat_capacity"],
    }


def metric_stats(
    key: jax.Array,
    data: Array,
    temp: np.ndarray,
    n_samples: int = 1024,
    batch_size: int = 1024,
    *,
    regularize: bool = False,
    adaptive_knn: bool = False,
    knn_k: int = 5,
    sigma_reg_scale: float = 1.0,
    mesh=None,
    stream_chunk: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Reference metric-stats artifact contract:
    {temp, metric, log_temp, dataset_tr_sigma0}.

    Parity: utils/stats.py compute_metric_stats.
    ``stream_chunk``: host-streaming tier for >HBM datasets (thermo_sweep).
    """
    out = thermo_sweep(
        key, data, temp, n_samples, batch_size,
        regularize=regularize, adaptive_knn=adaptive_knn, knn_k=knn_k,
        sigma_reg_scale=sigma_reg_scale, mesh=mesh,
        stream_chunk=stream_chunk,
    )
    return {
        "temp": out["temp"],
        "metric": out["metric"],
        "log_temp": out["log_temp"],
        "dataset_tr_sigma0": out["dataset_tr_sigma0"],
    }
