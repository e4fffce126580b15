"""Pallas TPU kernel for the fused Boltzmann-posterior moments op.

One kernel computes, for query tile x (TB, D) against the dataset streamed
in (TN, D) tiles: the Gram-expansion energies on the MXU, the online-
softmax renormalization, the shifted energy moments, and the posterior
mean of a per-point value payload — entirely in VMEM, with the (B x N)
logit matrix never touching HBM. This is the flash-attention pattern
applied to the dataset axis (SURVEY §5: the workload's "long axis").

vs the XLA lax.scan path (ops/boltzmann.py): XLA materializes the per-chunk
logits in HBM between the GEMM and the softmax/moment reductions; here the
whole epilogue runs on the logits while they're still in VMEM, so the HBM
traffic drops to (reading x and y once + tiny outputs).

Grid: (B tiles, N tiles), N innermost and sequential ("arbitrary"),
accumulators carried across N tiles in VMEM scratch; outputs written on
the last N tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _tiles(B: int, N: int, D: int, K: int):
    """Pick (TB, TN) so double-buffered input tiles + scratch fit VMEM."""
    TB = 128 if B > 8 else 8
    # y tile budget ~1 MB (x2 for double buffering), lane-aligned
    tn = (1 << 20) // (4 * max(D, 128))
    TN = max(128, min(2048, (tn // 128) * 128))
    return TB, TN


def _kernel(
    n_total_ref,  # SMEM (1,1): true N before padding
    inv_temp_ref,  # (TB, 1)
    y_scale_ref,  # (TB, 1)
    x_ref,  # (TB, D)
    y_ref,  # (TN, D)
    v_ref,  # (TN, K) or None
    logz_ref,  # (TB, 1)
    shift_ref,  # (TB, 1)
    e1_ref,  # (TB, 1)
    e2_ref,  # (TB, 1)
    mean_ref,  # (TB, K) or None
    m_scr,  # (TB, 1)
    s0_scr,
    s1_scr,
    s2_scr,
    sy_scr,  # (TB, K) or None
    *,
    tn: int,
    compute_mean: bool,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s0_scr[:] = jnp.zeros_like(s0_scr)
        s1_scr[:] = jnp.zeros_like(s1_scr)
        s2_scr[:] = jnp.zeros_like(s2_scr)
        if compute_mean:
            sy_scr[:] = jnp.zeros_like(sy_scr)

    x = x_ref[:]  # (TB, D) fp32
    y = y_ref[:]  # (TN, D) fp32
    inv_t = inv_temp_ref[:]  # (TB, 1)
    scale = y_scale_ref[:]  # (TB, 1)

    x_sq = 0.5 * jnp.sum(x * x, axis=1, keepdims=True)  # (TB, 1)
    y_sq = 0.5 * jnp.sum(y * y, axis=1)[None, :]  # (1, TN)
    gram = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, TN)
    h = x_sq - scale * gram + (scale * scale) * y_sq
    l = -h * inv_t  # (TB, TN)

    # mask the padded dataset tail
    col = j * tn + jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    valid = col < n_total_ref[0, 0]
    l = jnp.where(valid, l, NEG_INF)

    m_old = m_scr[:]  # (TB, 1)
    m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
    finite = m_old > NEG_INF
    c = jnp.where(finite, jnp.exp(m_old - m_new), 0.0)
    delta = jnp.where(finite, m_new - m_old, 0.0)

    p = jnp.exp(l - m_new)  # (TB, TN); 0 on padding
    g_hat = jnp.where(valid, m_new - l, 0.0)

    s0 = s0_scr[:]
    s1 = s1_scr[:]
    s2 = s2_scr[:]
    m_scr[:] = m_new
    s0_scr[:] = s0 * c + jnp.sum(p, axis=1, keepdims=True)
    s1_scr[:] = (s1 + delta * s0) * c + jnp.sum(p * g_hat, axis=1, keepdims=True)
    s2_scr[:] = (s2 + (2.0 * delta) * s1 + (delta * delta) * s0) * c + jnp.sum(
        p * g_hat * g_hat, axis=1, keepdims=True
    )
    if compute_mean:
        sy_scr[:] = sy_scr[:] * c + jnp.dot(
            p, v_ref[:], preferred_element_type=jnp.float32
        )

    @pl.when(j == n_j - 1)
    def _finalize():
        m = m_scr[:]
        s0f = s0_scr[:]
        logz_ref[:] = m + jnp.log(s0f)
        shift_ref[:] = m
        e1_ref[:] = s1_scr[:] / s0f
        e2_ref[:] = s2_scr[:] / s0f
        if compute_mean:
            mean_ref[:] = sy_scr[:] / s0f


@functools.partial(
    jax.jit, static_argnames=("compute_mean", "interpret")
)
def _pallas_moments(
    x: Array,
    y: Array,
    inv_temp: Array,
    y_scale: Array,
    values: Optional[Array],
    compute_mean: bool,
    interpret: bool = False,
):
    B, D = x.shape
    N = y.shape[0]
    K = values.shape[1] if values is not None else 0
    TB, TN = _tiles(B, N, D, K)

    pad_b = (-B) % TB
    pad_n = (-N) % TN
    xp = jnp.pad(x, ((0, pad_b), (0, 0)))
    yp = jnp.pad(y, ((0, pad_n), (0, 0)))
    itp = jnp.pad(inv_temp.reshape(B, 1), ((0, pad_b), (0, 0)))
    scp = jnp.pad(y_scale.reshape(B, 1), ((0, pad_b), (0, 0)), constant_values=1.0)
    Bp, Np = B + pad_b, N + pad_n
    grid = (Bp // TB, Np // TN)

    n_total = jnp.full((1, 1), N, jnp.int32)

    def row_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_total
        row_spec((TB, 1)),  # inv_temp
        row_spec((TB, 1)),  # y_scale
        row_spec((TB, D)),  # x
        pl.BlockSpec((TN, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),  # y
    ]
    inputs = [n_total, itp, scp, xp, yp]
    if compute_mean:
        vp = jnp.pad(values, ((0, pad_n), (0, 0)))
        in_specs.append(
            pl.BlockSpec((TN, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(vp)

    out_shape = [
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # logz
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # shift
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # e1
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),  # e2
    ]
    out_specs = [row_spec((TB, 1)) for _ in range(4)]
    if compute_mean:
        out_shape.append(jax.ShapeDtypeStruct((Bp, K), jnp.float32))
        out_specs.append(row_spec((TB, K)))

    scratch = [
        pltpu.VMEM((TB, 1), jnp.float32),  # m
        pltpu.VMEM((TB, 1), jnp.float32),  # s0
        pltpu.VMEM((TB, 1), jnp.float32),  # s1
        pltpu.VMEM((TB, 1), jnp.float32),  # s2
    ]
    scratch.append(
        pltpu.VMEM((TB, K), jnp.float32) if compute_mean else pltpu.VMEM((8, 128), jnp.float32)
    )

    kernel = functools.partial(_kernel, tn=TN, compute_mean=compute_mean)
    if not compute_mean:
        # drop the unused v_ref / mean_ref positions
        def kernel(n_ref, it_ref, sc_ref, x_ref, y_ref, lz, sh, e1, e2,
                   m_s, s0_s, s1_s, s2_s, dummy):
            return _kernel(
                n_ref, it_ref, sc_ref, x_ref, y_ref, None, lz, sh, e1, e2,
                None, m_s, s0_s, s1_s, s2_s, None, tn=TN, compute_mean=False,
            )

    flops = 2 * Bp * Np * D + (2 * Bp * Np * K if compute_mean else 0)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (Bp * D + Np * D * (Bp // TB) + Np * K),
            transcendentals=Bp * Np,
        ),
        interpret=interpret,
    )(*inputs)

    logz, shift, e1, e2 = outs[0], outs[1], outs[2], outs[3]
    mean = outs[4][:B] if compute_mean else None
    return (
        logz[:B, 0],
        shift[:B, 0],
        e1[:B, 0],
        e2[:B, 0],
        mean,
    )


def boltzmann_moments_pallas(
    x: Array,
    y: Array,
    inv_temp: Array = 1.0,
    y_scale: Array = 1.0,
    *,
    values: Optional[Array] = None,
    compute_mean: bool = False,
    interpret: bool = False,
):
    """Same contract as ops.boltzmann.boltzmann_moments_xla."""
    from .boltzmann import BoltzmannMoments, _prep, _resolve_values

    vals = _resolve_values(y, values, compute_mean)
    xf, yf, inv_temp, y_scale = _prep(x, y, inv_temp, y_scale)
    logz, shift, e1, e2, mean = _pallas_moments(
        xf, yf, inv_temp, y_scale, vals, vals is not None, interpret
    )
    return BoltzmannMoments(
        log_z=logz, shift=shift, e1_hat=e1, e2_hat=e2, mean=mean
    )
