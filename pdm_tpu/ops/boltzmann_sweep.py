"""Fused multi-temperature Boltzmann sweep — the thermo-sweep hot path.

The thermodynamic sweeps (stats/sweep.py) evaluate the Boltzmann posterior
of VE-noised trajectories ``xt(T) = x0 + sqrt(T) eps`` at ~10^2
temperatures. Done naively (reference utils/stats.py:261-311, and this
framework's round-1 path) every temperature is a full B x N x D Gram pass:
n_temps * 2BND MXU flops.

With the noise draw SHARED across temperatures (common random numbers — a
standard MC variance-reduction device; every per-temperature estimate stays
exactly unbiased, and differences S(T_{k+1}) - S(T_k) get *smoother*), the
energy decomposes over ONE pair of Grams:

    h_ij(T) = C0_ij + sqrt(T) * D0_ij + T * esq_i
    C0_ij   = 0.5|x0_i|^2 - x0_i.y_j + 0.5|y_j|^2
    D0_ij   = x0_i.eps_i - eps_i.y_j
    esq_i   = 0.5|eps_i|^2
    logits  l_ij(T) = -h/T = -C0/T - D0/sqrt(T) - esq_i

so the whole sweep costs TWO Grams plus an elementwise per-temperature
epilogue. The Pallas kernel keeps C0/D0 in VMEM and runs the online-softmax
moment accumulation for every temperature on the resident block — the
(B x N x n_temps) logit tensor never exists anywhere. XLA cannot express
this fusion: it would round-trip (B x N) logit slabs to HBM per
temperature.

Measured on the bench chip (B=1024, N=50k, D=3072, 96 temps): the round-1
per-temperature path costs ~0.92 s; this kernel ~40 ms (~23x).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boltzmann import BoltzmannMoments, boltzmann_moments_xla
from .boltzmann_pallas import PreparedY, _pad_dims, _prepared, _round_up

NEG_INF = float("-inf")

# Default MXU precision for the sweeps. "fp32" measures 100-1000x more
# accurate than the on-TPU XLA per-temperature path (whose fp32 matmuls
# XLA lowers to bf16 passes) and is only ~20% slower than "bf16_3x" here
# because the per-temperature epilogue, not the Gram, dominates.
# Resolution: PDM_SWEEP_PRECISION > PDM_BOLTZMANN_PRECISION > fp32 — one
# policy for all Gram ops (ops/precision.py).
from .precision import sweep_precision_mode

SWEEP_PRECISION = sweep_precision_mode()


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU path / oracle): same shared-noise
# protocol, one full pass per temperature.
# ---------------------------------------------------------------------------


def boltzmann_sweep_xla(
    x0: Array,
    eps: Array,
    y: Array,
    temps: Array,
    *,
    values: Optional[Array] = None,
) -> BoltzmannMoments:
    """Moments of the posterior at xt(T) = x0 + sqrt(T) eps for every T.

    Returns BoltzmannMoments with (n_temps, B)-shaped fields (mean:
    (n_temps, B, K)).
    """

    def per_temp(t):
        xt = x0 + jnp.sqrt(t) * eps
        return boltzmann_moments_xla(xt, y, inv_temp=1.0 / t, values=values)

    return jax.lax.map(per_temp, jnp.asarray(temps, jnp.float32))


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------


def _sweep_tiles(B: int, Dp: int, NT: int, esz: int):
    """(TB, TN, TD): scratch = 2 Grams (TB, TN) + 4-5 accumulators
    (TB, NTp); epilogue temporaries ~3 (TB, TN) fp32."""
    import os

    override = os.environ.get("PDM_SWEEP_TILES")
    if override:
        tb, tn, td = (int(v) for v in override.split(","))
        return tb, tn, td
    TD = min(Dp, 512)
    TB = min(_round_up(B, 8), 256)
    TN = 512
    return TB, TN, TD


def _sweep_kernel(
    n_total_ref,  # SMEM (1,1) int32: true N
    invt_ref,  # SMEM (NTp,) f32: 1/T  (0 on padded temps)
    irt_ref,  # SMEM (NTp,) f32: 1/sqrt(T)
    xsq_ref,  # (TB, 1) 0.5|x0|^2
    xe_ref,  # (TB, 1) x0.eps
    esq_ref,  # (TB, 1) 0.5|eps|^2
    ysq_ref,  # (1, TN)
    x_hi, x_lo,  # (TB, TD); lo None unless bf16_3x
    e_hi, e_lo,  # (TB, TD)
    y_hi, y_lo,  # (TN, TD)
    v_ref,  # (TN, 1) or None
    logz_ref,  # (TB, NTp)
    shift_ref,
    e1_ref,
    e2_ref,
    mean_ref,  # (TB, NTp) or None
    a_scr,  # (TB, TN): Gram(x0, y) -> C0
    b_scr,  # (TB, TN): Gram(eps, y) -> D0
    m_scr,  # (TB, NTp)
    s0_scr,
    s1_scr,
    s2_scr,
    sy_scr,  # (TB, NTp) or None
    *,
    tn: int,
    n_temps: int,
    compute_mean: bool,
):
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_j = pl.num_programs(1)
    n_k = pl.num_programs(2)

    @pl.when((j == 0) & (k == 0))
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s0_scr[:] = jnp.zeros_like(s0_scr)
        s1_scr[:] = jnp.zeros_like(s1_scr)
        s2_scr[:] = jnp.zeros_like(s2_scr)
        if compute_mean:
            sy_scr[:] = jnp.zeros_like(sy_scr)

    def dot_t(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if a.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )

    def gram(hi_x, lo_x):
        part = dot_t(hi_x[:], y_hi[:])
        if lo_x is not None:
            part += dot_t(hi_x[:], y_lo[:]) + dot_t(lo_x[:], y_hi[:])
        return part

    part_a = gram(x_hi, x_lo)
    part_b = gram(e_hi, e_lo)

    @pl.when(k == 0)
    def _set():
        a_scr[:] = part_a
        b_scr[:] = part_b

    @pl.when(k > 0)
    def _acc():
        a_scr[:] = a_scr[:] + part_a
        b_scr[:] = b_scr[:] + part_b

    @pl.when(k == n_k - 1)
    def _epilogue():
        # C0 / D0 once per (i, j) block, then the temperature loop
        c0 = xsq_ref[:] - a_scr[:] + ysq_ref[:]
        d0 = xe_ref[:] - b_scr[:]
        esq = esq_ref[:]
        col = j * tn + jax.lax.broadcasted_iota(jnp.int32, c0.shape, 1)
        valid = col < n_total_ref[0, 0]
        if compute_mean:
            v = v_ref[:].astype(jnp.float32)  # (TN, 1)

        # Mosaic can't dynamically slice the lane (temperature) axis of the
        # accumulators, so column t is accessed through a one-hot lane mask:
        # read = masked reduce, write = masked select. ~25% epilogue
        # overhead vs direct slicing; the (TB, TN) block math dominates.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, m_scr.shape[1]), 1)

        def body(t, _):
            msk = lane == t
            invt = invt_ref[t]
            irt = irt_ref[t]
            l = -(invt * c0 + irt * d0) - esq
            l = jnp.where(valid, l, NEG_INF)

            def rd_sum(scr):
                return jnp.sum(
                    jnp.where(msk, scr[:], 0.0), axis=1, keepdims=True
                )

            m_old = jnp.max(
                jnp.where(msk, m_scr[:], NEG_INF), axis=1, keepdims=True
            )
            m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
            finite = m_old > NEG_INF
            c = jnp.where(finite, jnp.exp(m_old - m_new), 0.0)
            delta = jnp.where(finite, m_new - m_old, 0.0)

            p = jnp.exp(l - m_new)
            g_hat = jnp.where(valid, m_new - l, 0.0)
            pg = p * g_hat

            s0 = rd_sum(s0_scr)
            s1 = rd_sum(s1_scr)
            s2 = rd_sum(s2_scr)
            m_scr[:] = jnp.where(msk, m_new, m_scr[:])
            s0_scr[:] = jnp.where(
                msk, s0 * c + jnp.sum(p, axis=1, keepdims=True), s0_scr[:]
            )
            s1_scr[:] = jnp.where(
                msk,
                (s1 + delta * s0) * c + jnp.sum(pg, axis=1, keepdims=True),
                s1_scr[:],
            )
            s2_scr[:] = jnp.where(
                msk,
                (s2 + (2.0 * delta) * s1 + (delta * delta) * s0) * c
                + jnp.sum(pg * g_hat, axis=1, keepdims=True),
                s2_scr[:],
            )
            if compute_mean:
                sy = rd_sum(sy_scr)
                sy_scr[:] = jnp.where(
                    msk,
                    sy * c + jnp.dot(p, v, preferred_element_type=jnp.float32),
                    sy_scr[:],
                )
            return 0

        jax.lax.fori_loop(0, n_temps, body, 0)

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
    jax.jit,
    static_argnames=("n_true", "n_temps", "compute_mean", "mxu_precision",
                     "interpret"),
)
def _sweep_pallas(
    x0: Array,
    eps: Array,
    temps: Array,  # (NT,)
    values: Optional[Array],
    y_hi: Array,
    y_lo: Optional[Array],
    ysq: Array,
    n_true: int,
    n_temps: int,
    compute_mean: bool,
    mxu_precision: str,
    interpret: bool,
):
    B, D = x0.shape
    Np, Dp = y_hi.shape
    esz = 4 if mxu_precision == "fp32" else 2
    TB, TN, TD = _sweep_tiles(B, Dp, n_temps, esz)
    NTp = _round_up(n_temps, 128)

    pad_b = (-B) % TB
    xp = jnp.pad(x0, ((0, pad_b), (0, Dp - D)))
    ep = jnp.pad(eps, ((0, pad_b), (0, Dp - D)))
    Bp = B + pad_b
    grid = (Bp // TB, Np // TN, Dp // TD)

    xsq = 0.5 * jnp.sum(xp * xp, axis=1, keepdims=True)
    xe = jnp.sum(xp * ep, axis=1, keepdims=True)
    esq = 0.5 * jnp.sum(ep * ep, axis=1, keepdims=True)

    three_pass = mxu_precision == "bf16_3x"

    def split(a):
        if mxu_precision == "fp32":
            return a, None
        hi = a.astype(jnp.bfloat16)
        if not three_pass:
            return hi, None
        return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    x_hi, x_lo = split(xp)
    e_hi, e_lo = split(ep)

    n_total = jnp.full((1, 1), n_true, jnp.int32)
    invt = jnp.pad(1.0 / jnp.asarray(temps, jnp.float32), (0, NTp - n_temps))
    irt = jnp.pad(
        1.0 / jnp.sqrt(jnp.asarray(temps, jnp.float32)), (0, NTp - n_temps)
    )

    def row_spec(shape):
        return pl.BlockSpec(shape, lambda i, j, k: (i, 0), memory_space=pltpu.VMEM)

    d_spec_x = pl.BlockSpec((TB, TD), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    d_spec_y = pl.BlockSpec((TN, TD), lambda i, j, k: (j, k), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_total
        pl.BlockSpec(memory_space=pltpu.SMEM),  # invt
        pl.BlockSpec(memory_space=pltpu.SMEM),  # irt
        row_spec((TB, 1)),  # xsq
        row_spec((TB, 1)),  # xe
        row_spec((TB, 1)),  # esq
        pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [n_total, invt, irt, xsq, xe, esq, ysq]
    for arr, spec in ((x_hi, d_spec_x), (x_lo, d_spec_x), (e_hi, d_spec_x),
                      (e_lo, d_spec_x), (y_hi, d_spec_y), (y_lo, d_spec_y)):
        if arr is not None:
            in_specs.append(spec)
            inputs.append(arr)
    if compute_mean:
        vp = jnp.pad(values, ((0, Np - values.shape[0]), (0, 0)))
        in_specs.append(
            pl.BlockSpec((TN, 1), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(vp)

    n_out = 5 if compute_mean else 4
    out_shape = [jax.ShapeDtypeStruct((Bp, NTp), jnp.float32)] * n_out
    out_specs = [row_spec((TB, NTp)) for _ in range(n_out)]

    scratch = [
        pltpu.VMEM((TB, TN), jnp.float32),  # a (C0)
        pltpu.VMEM((TB, TN), jnp.float32),  # b (D0)
        pltpu.VMEM((TB, NTp), jnp.float32),  # m
        pltpu.VMEM((TB, NTp), jnp.float32),  # s0
        pltpu.VMEM((TB, NTp), jnp.float32),  # s1
        pltpu.VMEM((TB, NTp), jnp.float32),  # s2
    ]
    if compute_mean:
        scratch.append(pltpu.VMEM((TB, NTp), jnp.float32))

    def kernel(n_ref, invt_ref, irt_ref, xsq_r, xe_r, esq_r, ysq_r, *rest):
        # rest: data blocks, [v], outputs, scratch
        nx = 6 if three_pass else 3
        blocks = list(rest[:nx])
        off = nx
        if three_pass:
            x_hi_r, x_lo_r, e_hi_r, e_lo_r, y_hi_r, y_lo_r = blocks
        else:
            x_hi_r, e_hi_r, y_hi_r = blocks
            x_lo_r = e_lo_r = y_lo_r = None
        v_r = rest[off] if compute_mean else None
        off += 1 if compute_mean else 0
        outs = rest[off : off + n_out]
        scr = rest[off + n_out:]
        lz, sh, e1, e2 = outs[:4]
        mean_r = outs[4] if compute_mean else None
        a_s, b_s, m_s, s0_s, s1_s, s2_s = scr[:6]
        sy_s = scr[6] if compute_mean else None
        return _sweep_kernel(
            n_ref, invt_ref, irt_ref, xsq_r, xe_r, esq_r, ysq_r,
            x_hi_r, x_lo_r, e_hi_r, e_lo_r, y_hi_r, y_lo_r, v_r,
            lz, sh, e1, e2, mean_r,
            a_s, b_s, m_s, s0_s, s1_s, s2_s, sy_s,
            tn=TN, n_temps=n_temps, compute_mean=compute_mean,
        )

    passes = 3 if three_pass else 1
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * passes * 2 * Bp * Np * Dp,
            bytes_accessed=2 * esz * passes
            * (Bp * Dp * (Np // TN) + Np * Dp * (Bp // TB)),
            transcendentals=Bp * Np * n_temps,
        ),
        interpret=interpret,
    )(*inputs)

    # -> (NT, B) to match the lax.map-over-temps stacking convention
    def cut(o):
        return o[:B, :n_temps].T

    logz, shift, e1, e2 = (cut(o) for o in outs[:4])
    mean = cut(outs[4])[..., None] if compute_mean else None
    return logz, shift, e1, e2, mean


def boltzmann_sweep(
    x0: Array,
    eps: Array,
    y,
    temps: Array,
    *,
    values: Optional[Array] = None,
    mxu_precision: Optional[str] = None,
    interpret: bool = False,
    force_xla: bool = False,
) -> BoltzmannMoments:
    """Dispatch: fused Pallas sweep on TPU, per-temperature XLA elsewhere.

    ``y`` may be a raw dataset array or a PreparedY. Returns
    BoltzmannMoments with (n_temps, B) fields; ``values`` must be (N, 1)
    (the sweep's adaptive-regularization payload) when given.
    """
    import os

    if mxu_precision is None:
        mxu_precision = sweep_precision_mode()
    if isinstance(y, PreparedY):
        # the pack's layout must match the requested MXU precision
        want_lo = mxu_precision == "bf16_3x"
        want_dtype = jnp.float32 if mxu_precision == "fp32" else jnp.bfloat16
        if (y.y_lo is not None) != want_lo or y.y_hi.dtype != want_dtype:
            raise ValueError(
                f"PreparedY was built for a different mxu_precision than "
                f"{mxu_precision!r}; call prepare_y(y, {mxu_precision!r})"
            )
    n_temps = int(temps.shape[0])
    use_pallas = (
        not force_xla
        and os.environ.get("PDM_SWEEP_IMPL", "pallas") != "xla"
        and (interpret or jax.default_backend() == "tpu")
    )
    if not use_pallas:
        raw = y.y_hi if isinstance(y, PreparedY) else y
        if isinstance(y, PreparedY):
            raise ValueError("XLA sweep path needs the raw dataset array")
        return boltzmann_sweep_xla(x0, eps, raw, temps, values=values)

    prep = _prepared(y, mxu_precision)
    if values is not None:
        assert values.shape[1] == 1, "sweep payload is (N, 1)"
        values = values.astype(jnp.float32)
    logz, shift, e1, e2, mean = _sweep_pallas(
        x0.reshape(x0.shape[0], -1).astype(jnp.float32),
        eps.reshape(eps.shape[0], -1).astype(jnp.float32),
        jnp.asarray(temps, jnp.float32),
        values,
        prep.y_hi, prep.y_lo, prep.ysq, prep.n,
        n_temps, values is not None, mxu_precision, interpret,
    )
    return BoltzmannMoments(
        log_z=logz, shift=shift, e1_hat=e1, e2_hat=e2, mean=mean
    )


def boltzmann_sweep_shard_body(
    x0: Array,
    eps: Array,
    y_shard: Array,
    temps: Array,
    *,
    axis_name: str,
    values: Optional[Array] = None,
    mxu_precision: Optional[str] = None,
) -> BoltzmannMoments:
    """Per-shard body to run under ``shard_map``: the dataset (and values)
    shard over ``axis_name``; x0/eps/temps replicated. Each chip runs the
    fused sweep on its shard, then the per-temperature online-softmax
    accumulators merge exactly (pmax global shift, rescale, psum) — the
    same merge as boltzmann_moments_shard_body, vectorized over the
    (n_temps, B) moment arrays.
    """
    local = boltzmann_sweep(
        x0, eps, y_shard, temps, values=values, mxu_precision=mxu_precision
    )
    # recover raw accumulator sums from the per-shard normalized moments:
    # s0 = exp(log_z - m), s1 = e1_hat * s0, s2 = e2_hat * s0
    m = local.shift
    s0 = jnp.exp(local.log_z - m)
    s1 = local.e1_hat * s0
    s2 = local.e2_hat * s0

    m_g = jax.lax.pmax(m, axis_name)
    finite = jnp.isfinite(m)
    c = jnp.where(finite, jnp.exp(m - m_g), 0.0)
    delta = jnp.where(finite, m_g - m, 0.0)
    s0_g = jax.lax.psum(s0 * c, axis_name)
    s1_g = jax.lax.psum((s1 + delta * s0) * c, axis_name)
    s2_g = jax.lax.psum(
        (s2 + 2.0 * delta * s1 + jnp.square(delta) * s0) * c, axis_name
    )
    mean_g = (
        None
        if local.mean is None
        else jax.lax.psum(local.mean * (s0 * c / s0_g)[..., None], axis_name)
    )
    return BoltzmannMoments(
        log_z=m_g + jnp.log(s0_g),
        shift=m_g,
        e1_hat=s1_g / s0_g,
        e2_hat=s2_g / s0_g,
        mean=mean_g,
    )
