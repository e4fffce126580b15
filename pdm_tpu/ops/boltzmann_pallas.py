"""Pallas TPU kernel for the fused Boltzmann-posterior moments op.

One kernel computes, for query tiles x (TB, D) against the dataset streamed
in (TN, D) tiles: the Gram-expansion energies on the MXU, the online-
softmax renormalization, the shifted energy moments, and the posterior
mean of a per-point value payload — entirely in VMEM, with the (B x N)
logit matrix never touching HBM. This is the flash-attention pattern
applied to the dataset axis (SURVEY §5: the workload's "long axis").

The contraction (D) axis is tiled through the grid (third, innermost grid
dimension) with a fp32 partial-Gram accumulator in VMEM scratch, so VMEM
holds (TB, TD) + (TN, TD) blocks instead of full-D rows — that keeps the
dataset tile TN large (512+) at D=3072 where the round-1 kernel was stuck
at TN=128 and lost to XLA.

MXU precision: fp32 inputs are split into a bf16 hi/lo pair and the Gram
runs as three bf16 passes accumulated in fp32 (hi*hi + hi*lo + lo*hi) —
the same error profile as XLA's default-precision fp32 matmul lowering on
TPU, at single-pass-per-term MXU rate. ``mxu_precision="bf16"`` drops to
one pass for bandwidth-bound high-temperature sweeps; ``"fp32"`` keeps
full-precision operands (slow, exactness oracle).

The pad + hi/lo split + row-norms of the DATASET cost several ms at
CIFAR scale and are invariant across the hundreds of op calls in a sweep,
so they are factored into ``prepare_y`` and memoized per (dataset array,
precision) in a weak-keyed cache — callers keep passing the raw array.

vs the XLA lax.scan path (ops/boltzmann.py): XLA materializes the
per-chunk logits in HBM between the GEMM and the softmax/moment
reductions; here the whole epilogue runs on the logits while they're
still in VMEM, so HBM traffic drops to (reading x and y once per B-tile
+ tiny outputs).

Grid: (B tiles, N tiles, D tiles), D innermost and sequential, N
sequential (accumulators carried across N tiles in VMEM scratch);
outputs are written on the last (N, D) tile.
"""

from __future__ import annotations

import functools
import weakref
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

_VMEM_BUDGET = 11 * 1024 * 1024  # bytes of explicit buffers (of ~16 MB/core)

# padding granularity of prepared datasets — every tile choice divides these,
# so a dataset prepared once works for any (B, K) the kernel later sees
_N_PAD = 1024
_D_PAD = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_dims(N: int, D: int):
    return _round_up(N, _N_PAD), _round_up(D, 128 if D < _D_PAD else _D_PAD)


def _tiles(B: int, N: int, D: int, K: int, esz: int):
    """(TB, TN, TD) so that x/y/v blocks (double-buffered), the Gram
    accumulator, and the epilogue temporaries fit the VMEM budget.
    ``esz``: bytes per Gram operand element (2 bf16 / 4 fp32)."""
    import os

    override = os.environ.get("PDM_PALLAS_TILES")
    if override:
        tb, tn, td = (int(v) for v in override.split(","))
        return tb, tn, td
    Np, Dp = _pad_dims(N, D)
    TD = min(Dp, _D_PAD)
    TB = min(_round_up(B, 8), 512)
    # choose TN: (x + y + v blocks, double-buffered) + gram + ~3 epilogue
    # temps of (TB, TN) fp32 + sy scratch
    tn = 1024
    while tn > 128:
        x_b = 2 * TB * TD * esz * 2
        y_b = 2 * tn * TD * esz * 2
        v_b = tn * K * 4 * 2
        gram_b = TB * tn * 4 * 4  # gram + ~3 epilogue temporaries
        sy_b = TB * K * 4
        if x_b + y_b + v_b + gram_b + sy_b <= _VMEM_BUDGET:
            break
        tn //= 2
    return TB, tn, TD


# ---------------------------------------------------------------------------
# dataset preparation (pad + hi/lo split + row norms), weakly memoized
# ---------------------------------------------------------------------------


class PreparedY(NamedTuple):
    """Kernel-ready dataset pack (padded to (_N_PAD, _D_PAD) multiples)."""

    y_hi: Array  # (Np, Dp) bf16 (or fp32 in "fp32" mode)
    y_lo: Optional[Array]  # (Np, Dp) bf16 ("bf16_3x" mode only)
    ysq: Array  # (1, Np) fp32: 0.5*||y_j||^2 (0 on padding)
    n: int  # true N
    d: int  # true D


@functools.partial(jax.jit, static_argnames=("mxu_precision",))
def _prepare_y_impl(yf: Array, mxu_precision: str):
    N, D = yf.shape
    Np, Dp = _pad_dims(N, D)
    yp = jnp.pad(yf, ((0, Np - N), (0, Dp - D)))
    ysq = 0.5 * jnp.sum(yp * yp, axis=1)[None, :]
    if mxu_precision == "fp32":
        return yp, None, ysq
    y_hi = yp.astype(jnp.bfloat16)
    if mxu_precision == "bf16":
        return y_hi, None, ysq
    y_lo = (yp - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return y_hi, y_lo, ysq


def prepare_y(y: Array, mxu_precision: str = "bf16_3x") -> PreparedY:
    """Pad/split/norm a dataset once; reuse across op calls."""
    yf = y.reshape(y.shape[0], -1).astype(jnp.float32)
    y_hi, y_lo, ysq = _prepare_y_impl(yf, mxu_precision)
    return PreparedY(y_hi, y_lo, ysq, yf.shape[0], yf.shape[1])


# weak cache: (id(y), precision) -> (weakref(y), PreparedY). The weakref
# guards against id reuse after the source array is freed.
_PREP_CACHE: dict = {}


def _prepared(y: Array, mxu_precision: str) -> PreparedY:
    if isinstance(y, PreparedY):
        return y
    # a dead pack pins ~1.5x the dataset's bytes in HBM, so drop dead
    # entries on EVERY access, not just past a size threshold
    for k in [k for k, v in _PREP_CACHE.items() if v[0]() is None]:
        del _PREP_CACHE[k]
    key = (id(y), mxu_precision)
    hit = _PREP_CACHE.get(key)
    if hit is not None and hit[0]() is y:
        return hit[1]
    prep = prepare_y(y, mxu_precision)
    try:
        _PREP_CACHE[key] = (weakref.ref(y), prep)
    except TypeError:  # not weakref-able (e.g. numpy scalars in tests)
        pass
    return prep


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _kernel(
    n_total_ref,  # SMEM (1, 1): true N before padding
    inv_temp_ref,  # (TB, 1)
    y_scale_ref,  # (TB, 1)
    xsq_ref,  # (TB, 1)  0.5*||x_i||^2
    ysq_ref,  # (1, TN)  0.5*||y_j||^2
    x_hi_ref,  # (TB, TD)
    x_lo_ref,  # (TB, TD) bf16 or None (single-pass / fp32 modes)
    y_hi_ref,  # (TN, TD)
    y_lo_ref,  # (TN, TD) bf16 or None
    v_ref,  # (TN, K) or None
    logz_ref,  # (TB, 1)
    shift_ref,  # (TB, 1)
    e1_ref,  # (TB, 1)
    e2_ref,  # (TB, 1)
    mean_ref,  # (TB, K) or None
    gram_scr,  # (TB, TN) fp32 partial-Gram accumulator
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

    def dot_t(a, b):  # (TB, TD) x (TN, TD) -> (TB, TN), fp32 accumulate
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if a.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )

    x_hi = x_hi_ref[:]
    y_hi = y_hi_ref[:]
    part = dot_t(x_hi, y_hi)
    if x_lo_ref is not None:
        # bf16_3x: the dropped lo*lo term is ~2^-16 relative — the same
        # profile as XLA's multi-pass fp32 lowering
        part += dot_t(x_hi, y_lo_ref[:]) + dot_t(x_lo_ref[:], y_hi)

    @pl.when(k == 0)
    def _set():
        gram_scr[:] = part

    @pl.when(k > 0)
    def _acc():
        gram_scr[:] = gram_scr[:] + part

    @pl.when(k == n_k - 1)
    def _epilogue():
        inv_t = inv_temp_ref[:]  # (TB, 1)
        scale = y_scale_ref[:]  # (TB, 1)
        h = xsq_ref[:] - scale * gram_scr[:] + (scale * scale) * ysq_ref[:]
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
        s1_scr[:] = (s1 + delta * s0) * c + jnp.sum(
            p * g_hat, axis=1, keepdims=True
        )
        s2_scr[:] = (s2 + (2.0 * delta) * s1 + (delta * delta) * s0) * c + jnp.sum(
            p * g_hat * g_hat, axis=1, keepdims=True
        )
        if compute_mean:
            sy_scr[:] = sy_scr[:] * c + jnp.dot(
                p, v_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
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
    jax.jit,
    static_argnames=("n_true", "compute_mean", "mxu_precision", "interpret"),
)
def _pallas_moments(
    x: Array,
    inv_temp: Array,
    y_scale: Array,
    values: Optional[Array],
    y_hi: Array,
    y_lo: Optional[Array],
    ysq: Array,
    n_true: int,
    compute_mean: bool,
    mxu_precision: str = "bf16_3x",
    interpret: bool = False,
):
    B, D = x.shape
    Np, Dp = y_hi.shape
    K = values.shape[1] if values is not None else 0
    esz = 4 if mxu_precision == "fp32" else 2
    TB, TN, TD = _tiles(B, n_true, D, K, esz)

    pad_b = (-B) % TB
    xp = jnp.pad(x, ((0, pad_b), (0, Dp - D)))
    itp = jnp.pad(inv_temp.reshape(B, 1), ((0, pad_b), (0, 0)))
    scp = jnp.pad(y_scale.reshape(B, 1), ((0, pad_b), (0, 0)), constant_values=1.0)
    Bp = B + pad_b
    grid = (Bp // TB, Np // TN, Dp // TD)

    xsq = 0.5 * jnp.sum(xp * xp, axis=1, keepdims=True)  # (Bp, 1)

    three_pass = mxu_precision == "bf16_3x"
    if mxu_precision == "fp32":
        x_hi = xp
    else:
        x_hi = xp.astype(jnp.bfloat16)
    if three_pass:
        x_lo = (xp - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    n_total = jnp.full((1, 1), n_true, jnp.int32)

    def row_spec(shape):
        return pl.BlockSpec(shape, lambda i, j, k: (i, 0), memory_space=pltpu.VMEM)

    d_spec_x = pl.BlockSpec((TB, TD), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    d_spec_y = pl.BlockSpec((TN, TD), lambda i, j, k: (j, k), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_total
        row_spec((TB, 1)),  # inv_temp
        row_spec((TB, 1)),  # y_scale
        row_spec((TB, 1)),  # xsq
        pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        d_spec_x,  # x_hi
    ]
    inputs = [n_total, itp, scp, xsq, ysq, x_hi]
    if three_pass:
        in_specs += [d_spec_x, d_spec_y, d_spec_y]
        inputs += [x_lo, y_hi, y_lo]
    else:
        in_specs.append(d_spec_y)
        inputs.append(y_hi)
    if compute_mean:
        vp = jnp.pad(values, ((0, Np - values.shape[0]), (0, 0)))
        in_specs.append(
            pl.BlockSpec((TN, K), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)
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
        pltpu.VMEM((TB, TN), jnp.float32),  # gram accumulator
        pltpu.VMEM((TB, 1), jnp.float32),  # m
        pltpu.VMEM((TB, 1), jnp.float32),  # s0
        pltpu.VMEM((TB, 1), jnp.float32),  # s1
        pltpu.VMEM((TB, 1), jnp.float32),  # s2
    ]
    scratch.append(
        pltpu.VMEM((TB, K), jnp.float32)
        if compute_mean
        else pltpu.VMEM((8, 128), jnp.float32)
    )

    def kernel(n_ref, it_ref, sc_ref, xsq_ref, ysq_ref, *rest):
        nin = (4 if three_pass else 2) + (1 if compute_mean else 0)
        ins = rest[:nin]
        outs = rest[nin : nin + (5 if compute_mean else 4)]
        scr = rest[nin + (5 if compute_mean else 4):]
        if three_pass:
            x_hi_r, x_lo_r, y_hi_r, y_lo_r = ins[:4]
            v_r = ins[4] if compute_mean else None
        else:
            x_hi_r, y_hi_r = ins[:2]
            x_lo_r = y_lo_r = None
            v_r = ins[2] if compute_mean else None
        lz, sh, e1, e2 = outs[:4]
        mean_r = outs[4] if compute_mean else None
        gram_s, m_s, s0_s, s1_s, s2_s, sy_s = scr
        return _kernel(
            n_ref, it_ref, sc_ref, xsq_ref, ysq_ref,
            x_hi_r, x_lo_r, y_hi_r, y_lo_r, v_r,
            lz, sh, e1, e2, mean_r,
            gram_s, m_s, s0_s, s1_s, s2_s,
            sy_s if compute_mean else None,
            tn=TN, compute_mean=compute_mean,
        )

    passes = 3 if three_pass else 1
    flops = passes * 2 * Bp * Np * Dp + (2 * Bp * Np * K if compute_mean else 0)
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
            flops=flops,
            bytes_accessed=esz * passes
            * (Bp * Dp * (Np // TN) + Np * Dp * (Bp // TB))
            + 4 * Np * K,
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
    y,
    inv_temp: Array = 1.0,
    y_scale: Array = 1.0,
    *,
    values: Optional[Array] = None,
    compute_mean: bool = False,
    mxu_precision: str = "bf16_3x",
    interpret: bool = False,
):
    """Same contract as ops.boltzmann.boltzmann_moments_xla.

    ``y`` may be the raw dataset array or a ``PreparedY`` from
    ``prepare_y``; raw arrays are prepared once and memoized.
    """
    from .boltzmann import BoltzmannMoments, _prep, _resolve_values

    prep = _prepared(y, mxu_precision)
    three_pass = mxu_precision == "bf16_3x"
    if three_pass and prep.y_lo is None:
        raise ValueError(
            f"PreparedY was built without the low-order split but "
            f"mxu_precision={mxu_precision!r} needs it; rebuild with "
            f"prepare_y(y, 'bf16_3x') or pass a matching mxu_precision"
        )
    if not three_pass and mxu_precision == "fp32" and prep.y_hi.dtype != jnp.float32:
        raise ValueError(
            f"PreparedY pack is {prep.y_hi.dtype} but mxu_precision='fp32'; "
            f"rebuild with prepare_y(y, 'fp32')"
        )
    if compute_mean and values is None:
        if isinstance(y, PreparedY):
            raise ValueError(
                "compute_mean=True with a PreparedY needs explicit `values`"
                " (the prepared pack only stores the split dataset)"
            )
        vals = _resolve_values(y, None, True)
    else:
        vals = (
            values.reshape(values.shape[0], -1).astype(jnp.float32)
            if values is not None
            else None
        )

    B = x.shape[0]
    xf = x.reshape(B, -1).astype(jnp.float32)
    inv_temp = jnp.broadcast_to(jnp.asarray(inv_temp, jnp.float32), (B,))
    y_scale = jnp.broadcast_to(jnp.asarray(y_scale, jnp.float32), (B,))

    logz, shift, e1, e2, mean = _pallas_moments(
        xf, inv_temp, y_scale, vals,
        prep.y_hi, prep.y_lo, prep.ysq, prep.n,
        vals is not None, mxu_precision, interpret,
    )
    return BoltzmannMoments(
        log_z=logz, shift=shift, e1_hat=e1, e2_hat=e2, mean=mean
    )
