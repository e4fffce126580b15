"""Fused streaming Boltzmann-posterior moments — the framework's hot op.

Given queries ``x`` (B, D), a dataset ``y`` (N, D), per-query inverse
temperature ``inv_temp`` and optional per-query dataset scaling ``y_scale``,
the Boltzmann posterior over dataset points is

    H_ij = 0.5 * || x_i - y_scale_i * y_j ||^2          (energy)
    g_ij = H_ij * inv_temp_i                            (energy over T)
    p_ij = softmax_j(-g_ij)                             (posterior)

This op computes, in ONE streaming pass over the dataset axis with
flash-attention-style online renormalization (running max + rescaled
accumulators, all fp32):

    log_z_i  = logsumexp_j(-g_ij)
    E_p[g], E_p[g^2]   (kept *shift-stabilized*: moments of
                        g_hat = g + shift, shift = running max of -g,
                        so Var and entropy are cancellation-free)
    mean_i   = E_p[y_j]   (posterior mean -> Bayes-optimal denoiser)

Everything downstream is algebra on these outputs:
  * free energy / entropy sweep  (reference utils/stats.py:261-311)
  * Fisher-Rao metric G = Var_p[g] (reference utils/stats.py:71-111)
  * analytic true score / posterior mean (reference scheduler.py:47-69)

The (B x N) energy matrix is never materialized: the dataset streams through
in chunks (double-buffered HBM->VMEM on TPU via the Pallas kernel in
``boltzmann_pallas.py``; this module holds the portable lax.scan
implementation used as the CPU path and correctness oracle, plus the
dispatcher). The dataset axis shards across chips: each chip reduces its
shard's accumulators and the partials merge exactly with a pmax/rescale +
psum (``boltzmann_moments_shard_body``), riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..core.temperature import (
    alpha_bar_from_log_temp,
    bcast_right,
    one_minus_alpha_bar_from_log_temp,
)
from .precision import boltzmann_precision_mode, xla_dot_precision

DEFAULT_CHUNK = 0  # 0 = adaptive (see _auto_chunk)

# memory budgets for the streamed buffers (fp32 words)
_MAX_LOGIT_WORDS = 128 * 1024 * 1024  # B x chunk logits buffer: 512 MB
_MAX_YCHUNK_WORDS = 64 * 1024 * 1024  # chunk x D dataset tile: 256 MB


def _auto_chunk(B: int, N: int, D: int) -> int:
    """Pick the dataset-axis tile so each scan iteration is a large,
    MXU-saturating GEMM: as big as fits the memory budgets, multiple of
    128 lanes, at least 1024. Low-D problems (the GMM experiments) get
    tiles of 10^5-10^6 points, collapsing the scan to a handful of
    iterations instead of ~N/1024 dispatch-bound steps."""
    by_logits = _MAX_LOGIT_WORDS // max(B, 1)
    by_tile = _MAX_YCHUNK_WORDS // max(D, 1)
    chunk = max(1024, min(by_logits, by_tile))
    chunk = min(chunk, -(-N // 128) * 128)
    return max(128, (chunk // 128) * 128)


class BoltzmannMoments(NamedTuple):
    """Per-query posterior statistics (fp32, shift-stabilized).

    ``shift`` is the online-softmax stabilizer (running max of -g);
    ``e1_hat``/``e2_hat`` are posterior moments of ``g_hat = g + shift``.
    """

    log_z: Array  # (B,)   logsumexp_j(-g_ij)
    shift: Array  # (B,)   max_j(-g_ij)
    e1_hat: Array  # (B,)  E_p[g + shift]
    e2_hat: Array  # (B,)  E_p[(g + shift)^2]
    mean: Optional[Array]  # (B, K) E_p[values_j] (values defaults to y)

    @property
    def e1(self) -> Array:
        """E_p[g] — posterior mean energy over T."""
        return self.e1_hat - self.shift

    @property
    def var(self) -> Array:
        """Var_p[g] (shift-invariant, cancellation-free)."""
        return jnp.maximum(self.e2_hat - jnp.square(self.e1_hat), 0.0)

    def entropy(self, num_objects: int) -> Array:
        """S = log Z + E_p[g] - log N, computed as
        (log_z - shift) + e1_hat - log N so the large shift cancels
        analytically rather than in floating point."""
        return (self.log_z - self.shift) + self.e1_hat - jnp.log(float(num_objects))


class _RawAcc(NamedTuple):
    m: Array  # (B,) running max of -g
    s0: Array  # (B,) sum exp(-g - m)... normalized partition sum
    s1: Array  # (B,) sum exp * g_hat
    s2: Array  # (B,) sum exp * g_hat^2
    sy: Optional[Array]  # (B, D)


def _prep(x: Array, y: Array, inv_temp: Array, y_scale: Array):
    B = x.shape[0]
    xf = x.reshape(B, -1).astype(jnp.float32)
    yf = y.reshape(y.shape[0], -1).astype(jnp.float32)
    inv_temp = jnp.broadcast_to(jnp.asarray(inv_temp, jnp.float32), (B,))
    y_scale = jnp.broadcast_to(jnp.asarray(y_scale, jnp.float32), (B,))
    return xf, yf, inv_temp, y_scale


def _finalize(acc: _RawAcc) -> BoltzmannMoments:
    return BoltzmannMoments(
        log_z=acc.m + jnp.log(acc.s0),
        shift=acc.m,
        e1_hat=acc.s1 / acc.s0,
        e2_hat=acc.s2 / acc.s0,
        mean=None if acc.sy is None else acc.sy / acc.s0[:, None],
    )


def _scan_raw(
    xf: Array,
    yf: Array,
    inv_temp: Array,
    y_scale: Array,
    values: Optional[Array],
    chunk_size: int,
    mxu_precision: str = "fp32",
) -> _RawAcc:
    B, D = xf.shape
    N = yf.shape[0]
    chunk = chunk_size if chunk_size else _auto_chunk(B, N, D)
    chunk = min(chunk, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    yp = jnp.pad(yf, ((0, pad), (0, 0))) if pad else yf
    y_chunks = yp.reshape(n_chunks, chunk, D)
    if values is not None:
        K = values.shape[1]
        vp = jnp.pad(values, ((0, pad), (0, 0))) if pad else values
        v_chunks = vp.reshape(n_chunks, chunk, K)
    else:
        K, v_chunks = 0, None

    x_sq = 0.5 * jnp.sum(xf * xf, axis=-1)  # (B,)
    # The Gram term is where the cancellation lives (see ops/precision.py);
    # default fp32 matches the reference's forced-fp32 hot primitive
    # (utils/distance.py:13-21) instead of XLA's bf16 TPU lowering.
    dot_prec = xla_dot_precision(mxu_precision)

    def body(carry: _RawAcc, inp):
        m, s0, s1, s2, sy = carry
        ci, yc, vc = inp  # chunk index, (chunk, D), (chunk, K) or None
        # H_ij = 0.5||x_i||^2 - s_i x_i.y_j + 0.5 s_i^2 ||y_j||^2
        gram = jnp.dot(
            xf, yc.T, preferred_element_type=jnp.float32, precision=dot_prec
        )
        y_sq = 0.5 * jnp.sum(yc * yc, axis=-1)  # (chunk,)
        h = (
            x_sq[:, None]
            - y_scale[:, None] * gram
            + jnp.square(y_scale)[:, None] * y_sq[None, :]
        )
        l = -h * inv_temp[:, None]
        valid = (ci * chunk + jnp.arange(chunk))[None, :] < N
        l = jnp.where(valid, l, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(l, axis=-1))
        finite = jnp.isfinite(m)
        c = jnp.where(finite, jnp.exp(m - m_new), 0.0)
        delta = jnp.where(finite, m_new - m, 0.0)

        p = jnp.exp(l - m_new[:, None])  # (B, chunk); 0 on padding
        # g_hat = g + m_new = m_new - l  (shift-stabilized energy/T, >= 0
        # near the posterior mode where the weight lives)
        g_hat = jnp.where(valid, m_new[:, None] - l, 0.0)

        s0n = s0 * c + jnp.sum(p, axis=-1)
        s1n = (s1 + delta * s0) * c + jnp.sum(p * g_hat, axis=-1)
        s2n = (s2 + 2.0 * delta * s1 + jnp.square(delta) * s0) * c + jnp.sum(
            p * jnp.square(g_hat), axis=-1
        )
        syn = (
            None
            if sy is None
            else sy * c[:, None]
            + jnp.dot(
                p, vc, preferred_element_type=jnp.float32, precision=dot_prec
            )
        )
        return _RawAcc(m_new, s0n, s1n, s2n, syn), None

    zeros = jnp.zeros((B,), jnp.float32)
    init = _RawAcc(
        m=jnp.full((B,), -jnp.inf, jnp.float32),
        s0=zeros,
        s1=zeros,
        s2=zeros,
        sy=jnp.zeros((B, K), jnp.float32) if values is not None else None,
    )
    acc, _ = jax.lax.scan(body, init, (jnp.arange(n_chunks), y_chunks, v_chunks))
    return acc


def _resolve_values(
    y: Array, values: Optional[Array], compute_mean: bool
) -> Optional[Array]:
    if values is not None:
        return values.reshape(values.shape[0], -1).astype(jnp.float32)
    if compute_mean:
        return y.reshape(y.shape[0], -1).astype(jnp.float32)
    return None


@partial(
    jax.jit, static_argnames=("compute_mean", "chunk_size", "mxu_precision")
)
def boltzmann_moments_xla(
    x: Array,
    y: Array,
    inv_temp: Array,
    y_scale: Array = 1.0,
    *,
    values: Optional[Array] = None,
    compute_mean: bool = False,
    chunk_size: int = DEFAULT_CHUNK,
    mxu_precision: str = "fp32",
) -> BoltzmannMoments:
    """Portable lax.scan implementation (CPU path / oracle for the Pallas
    kernel). ``values`` (N, K): per-dataset-point payload whose posterior
    mean E_p[values] is returned as ``mean``; ``compute_mean=True`` is sugar
    for ``values=y``. ``mxu_precision``: see ops/precision.py."""
    vals = _resolve_values(y, values, compute_mean)
    xf, yf, inv_temp, y_scale = _prep(x, y, inv_temp, y_scale)
    return _finalize(
        _scan_raw(
            xf, yf, inv_temp, y_scale, vals, chunk_size, mxu_precision
        )
    )


def boltzmann_moments(
    x: Array,
    y: Array,
    inv_temp: Array,
    y_scale: Array = 1.0,
    *,
    values: Optional[Array] = None,
    compute_mean: bool = False,
    chunk_size: int = DEFAULT_CHUNK,
    mxu_precision: Optional[str] = None,
) -> BoltzmannMoments:
    """Dispatch between the two implementations.

    Precision: one policy for every Gram op, resolved by
    ``ops/precision.py`` (PDM_BOLTZMANN_PRECISION, default fp32) and obeyed
    by BOTH implementations — the round-2 float64-oracle test showed the
    default bf16 TPU lowering errs up to 0.67 entropy on the sweep case.

    Round-2 measurements (single chip, B=1024, N=50k, D=3072; the part's
    empirical MXU peak is ~108 TF/s bf16): the D-tiled Pallas kernel at
    XLA-equivalent precision (bf16_3x) runs 9.9 ms vs XLA's 9.6 ms — both
    at the MXU roofline — so the XLA path stays the default for the
    SINGLE-temperature op; PDM_BOLTZMANN_IMPL=pallas opts into the kernel
    (its "bf16" mode is 1.5x faster at reduced Gram precision). The real
    Pallas win is the MULTI-temperature sweep (ops/boltzmann_sweep.py,
    15-18x), which is the default for the thermo sweeps.
    """
    import os

    mode = boltzmann_precision_mode(mxu_precision)
    if (
        os.environ.get("PDM_BOLTZMANN_IMPL") == "pallas"
        and jax.default_backend() == "tpu"
    ):
        from .boltzmann_pallas import boltzmann_moments_pallas

        return boltzmann_moments_pallas(
            x, y, inv_temp, y_scale, values=values,
            compute_mean=compute_mean, mxu_precision=mode,
        )
    return boltzmann_moments_xla(
        x,
        y,
        inv_temp,
        y_scale,
        values=values,
        compute_mean=compute_mean,
        chunk_size=chunk_size,
        mxu_precision=mode,
    )


# ---------------------------------------------------------------------------
# High-level entry points
# ---------------------------------------------------------------------------


def true_posterior_mean_x0(xt: Array, log_temp: Array, data: Array) -> Array:
    """Bayes-optimal denoiser E[x0 | xt] over a finite dataset (VP process).

    Energy 0.5||xt - sqrt(ab) x0_j||^2 at temperature (1 - ab).
    Parity: reference scheduler.py:58-69.
    """
    B = xt.shape[0]
    log_temp = jnp.broadcast_to(jnp.asarray(log_temp, jnp.float32), (B,))
    ab = alpha_bar_from_log_temp(log_temp)
    omab = one_minus_alpha_bar_from_log_temp(log_temp)
    out = boltzmann_moments(
        xt, data, inv_temp=1.0 / omab, y_scale=jnp.sqrt(ab), compute_mean=True
    )
    return out.mean.reshape(xt.shape).astype(xt.dtype)


def true_score(xt: Array, log_temp: Array, data: Array) -> Array:
    """Analytic marginal score of the VP-noised data distribution.

    score = (sqrt(ab) E[x0|xt] - xt) / (1 - ab). Parity: scheduler.py:47-56.
    """
    B = xt.shape[0]
    log_temp = jnp.broadcast_to(jnp.asarray(log_temp, jnp.float32), (B,))
    ab = bcast_right(alpha_bar_from_log_temp(log_temp), xt.ndim)
    omab = bcast_right(one_minus_alpha_bar_from_log_temp(log_temp), xt.ndim)
    mean = true_posterior_mean_x0(xt, log_temp, data)
    return (jnp.sqrt(ab) * mean - xt) / omab


# ---------------------------------------------------------------------------
# Multi-chip: dataset axis sharded over the mesh
# ---------------------------------------------------------------------------


def boltzmann_moments_shard_body(
    x: Array,
    y_shard: Array,
    inv_temp: Array,
    y_scale: Array = 1.0,
    *,
    axis_name: str,
    values: Optional[Array] = None,
    compute_mean: bool = False,
    chunk_size: int = DEFAULT_CHUNK,
    mxu_precision: Optional[str] = None,
) -> BoltzmannMoments:
    """Per-shard body to run under ``shard_map``: the dataset ``y`` is
    sharded over ``axis_name`` (``values`` shards with it), queries ``x``
    replicated; the result is replicated. The per-shard online-softmax
    accumulators merge exactly: global max via pmax, rescale each shard's
    sums by exp(m - m_g), psum.
    """
    vals = _resolve_values(y_shard, values, compute_mean)
    xf, yf, inv_temp, y_scale = _prep(x, y_shard, inv_temp, y_scale)
    m, s0, s1, s2, sy = _scan_raw(
        xf, yf, inv_temp, y_scale, vals, chunk_size,
        boltzmann_precision_mode(mxu_precision),
    )

    m_g = jax.lax.pmax(m, axis_name)
    finite = jnp.isfinite(m)
    c = jnp.where(finite, jnp.exp(m - m_g), 0.0)
    delta = jnp.where(finite, m_g - m, 0.0)
    s0_g = jax.lax.psum(s0 * c, axis_name)
    s1_g = jax.lax.psum((s1 + delta * s0) * c, axis_name)
    s2_g = jax.lax.psum(
        (s2 + 2.0 * delta * s1 + jnp.square(delta) * s0) * c, axis_name
    )
    sy_g = None if sy is None else jax.lax.psum(sy * c[:, None], axis_name)
    return _finalize(_RawAcc(m_g, s0_g, s1_g, s2_g, sy_g))


# ---------------------------------------------------------------------------
# Host streaming: datasets larger than HBM
# ---------------------------------------------------------------------------


@jax.jit
def merge_moments(a: BoltzmannMoments, b: BoltzmannMoments) -> BoltzmannMoments:
    """Exact two-way merge of shift-stabilized Boltzmann moments.

    The sequential (host-chunk) analogue of the shard_map merge above
    (`boltzmann_moments_shard_body`): global shift via max, rescale each
    side's partition sums by exp(m - m_g), add. Shapes broadcast, so the
    same function merges the single-temperature (B,) layout and the sweep
    (n_temps, B) layout; `mean` merges partition-weighted when present.

    This is what lets the stats estimators stream a dataset the reference
    walks with a host dataloader (utils/stats.py:276-280) through device-
    resident chunks when N exceeds HBM (e.g. the 1.28M-point image-net
    config): per-chunk moments from the fused kernels, then this merge —
    bit-for-bit the same math as the multi-chip psum path.
    """
    m_g = jnp.maximum(a.shift, b.shift)

    def side(mom):
        finite = jnp.isfinite(mom.shift)
        c = jnp.where(finite, jnp.exp(mom.shift - m_g), 0.0)
        delta = jnp.where(finite, m_g - mom.shift, 0.0)
        s0 = jnp.exp(mom.log_z - mom.shift)
        s1 = mom.e1_hat * s0
        s2 = mom.e2_hat * s0
        s0n = s0 * c
        s1n = (s1 + delta * s0) * c
        s2n = (s2 + 2.0 * delta * s1 + jnp.square(delta) * s0) * c
        return s0n, s1n, s2n

    s0a, s1a, s2a = side(a)
    s0b, s1b, s2b = side(b)
    s0_g = s0a + s0b
    mean_g = None
    if a.mean is not None and b.mean is not None:
        wa = (s0a / s0_g)[..., None]
        wb = (s0b / s0_g)[..., None]
        mean_g = a.mean * wa + b.mean * wb
    return BoltzmannMoments(
        log_z=m_g + jnp.log(s0_g),
        shift=m_g,
        e1_hat=(s1a + s1b) / s0_g,
        e2_hat=(s2a + s2b) / s0_g,
        mean=mean_g,
    )
