"""Fused GroupNorm(+SiLU) for the UNet's normalization layers (OPT-IN —
measured end-to-end slower than XLA on the flagship; see
use_fused_groupnorm for the numbers and why it is kept).

Why a kernel was worth trying: the flagship UNet runs ~50 GroupNorms per
forward (two per ResNet block, one per attention block, one output norm).
XLA's fast path keeps the norm in fp32 (the bf16 group-reduce lowering is
pathological on this chip — see models/unet.py norm_dtype), which means
every norm casts the bf16 residual stream up to fp32 for the reduction +
normalize + SiLU and casts back down. The ablation
(scripts/ablate_unet.py) priced the GroupNorms at ~15% of the forward at
bs=64 — but that cost turns out to be XLA's irreducible reduce passes,
not fusion-recoverable traffic, while each extra pallas_call adds
~0.1-0.2 ms of fixed Mosaic dispatch.

Shape regime: one grid program per image holds the whole (S, C) activation
tile in VMEM (flagship worst case 1024x384 fp32 = 1.5 MB), reads the bf16
input ONCE, computes stats and the normalize+scale+SiLU epilogue in fp32
registers, and writes the bf16 output ONCE — minimum HBM traffic, no
fp32 activation tensors ever in HBM.

Group statistics without sublane reshapes: per-group sums come from the
channel sums via two tiny 0/1 "membership" matmuls (channels->groups and
back), built in-kernel from iota comparisons — the same trick as the
attention kernel's block-diagonal head packing (ops/attention.py). The
group axis is padded to a full 128-lane tile; padding columns compute
garbage that is never read back.

Backward is a custom VJP (flash-style recompute): stats are recomputed
from the saved bf16 input, dgamma/dbeta accumulate per-program partials
summed outside the kernel, and dx uses the standard GroupNorm VJP
   dx = inv * (dn - mean_g(dn) - n_hat * mean_g(dn * n_hat))
with the group means again via the membership matmuls.

Parity target: flax ``nn.GroupNorm(num_groups, eps, dtype=fp32)`` followed
by SiLU (reference: diffusers UNet2DModel's ResnetBlock2D norms under
torch GroupNorm, /root/reference/diffusion/ddpm/unet.py:12-31). The
module-level fallback in models/unet.py mirrors flax exactly and remains
the correctness oracle in tests/test_groupnorm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget: the backward holds ~6 live (S, C) fp32
# transients (x, n_hat, dz, dn, dx + epilogue temporaries). The flagship's
# largest norm tile is S=1024, C=384 (32x32 up-path concat) = 1.5 MB per
# transient, ~10 MB peak — safely schedulable. 1024x512 (which does not
# occur in the flagship) would push past it, so the gate is exact.
MAX_FUSED_GN_CELLS = 1024 * 384

# group axis padded to one full lane tile; padding columns hold garbage
# stats that are never broadcast back to a real channel
_GROUP_LANES = 128


def _membership(C: int, groups: int):
    """(C, 128) channel->group 0/1 matrix and its (128, C) transpose."""
    cpg = C // groups
    row = jax.lax.broadcasted_iota(jnp.int32, (C, _GROUP_LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, _GROUP_LANES), 1)
    m = (row // cpg == col).astype(jnp.float32)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (_GROUP_LANES, C), 0)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (_GROUP_LANES, C), 1)
    m_t = (col_t // cpg == row_t).astype(jnp.float32)
    return m, m_t


def _channel_stats(x, C: int, groups: int, eps: float):
    """Per-channel broadcast (1, C) mean and rsqrt(var+eps) of x's groups."""
    m, m_t = _membership(C, groups)
    n = x.shape[0] * (C // groups)
    cs = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    # HIGHEST precision: Mosaic lowers fp32 dots as single-pass bf16 by
    # default, which puts ~2e-3 relative error on the group variance (the
    # compiled kernel measurably diverged from its own interpret mode);
    # these (1, C) x (C, 128) dots are negligible FLOPs, so full fp32.
    hi = jax.lax.Precision.HIGHEST
    gs = jnp.dot(cs, m, preferred_element_type=jnp.float32, precision=hi)
    gss = jnp.dot(sq, m, preferred_element_type=jnp.float32, precision=hi)
    mu = gs / n
    var = jnp.maximum(gss / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.dot(mu, m_t, preferred_element_type=jnp.float32,
                   precision=hi)  # (1, C)
    inv_c = jnp.dot(inv, m_t, preferred_element_type=jnp.float32,
                    precision=hi)
    return mu_c, inv_c, m, m_t, n


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float,
                act: str):
    C = x_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    mu_c, inv_c, _, _, _ = _channel_stats(x, C, groups, eps)
    gamma = g_ref[...].astype(jnp.float32)  # (1, C)
    beta = b_ref[...].astype(jnp.float32)
    z = (x - mu_c) * (inv_c * gamma) + beta
    if act == "silu":
        z = z * jax.nn.sigmoid(z)
    o_ref[0] = z.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, b_ref, do_ref, dx_ref, dg_ref, db_ref, *,
                groups: int, eps: float, act: str):
    C = x_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    mu_c, inv_c, m, m_t, n = _channel_stats(x, C, groups, eps)
    gamma = g_ref[...].astype(jnp.float32)
    n_hat = (x - mu_c) * inv_c
    if act == "silu":
        z = n_hat * gamma + b_ref[...].astype(jnp.float32)
        s = jax.nn.sigmoid(z)
        dz = do * (s * (1.0 + z * (1.0 - s)))
    else:
        dz = do
    dg_ref[0] = jnp.sum(dz * n_hat, axis=0, keepdims=True)  # (1, C)
    db_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    dn = dz * gamma

    hi = jax.lax.Precision.HIGHEST

    def group_mean(t):  # (S, C) -> per-group mean broadcast back to (1, C)
        cs = jnp.sum(t, axis=0, keepdims=True)
        g = jnp.dot(cs, m, preferred_element_type=jnp.float32,
                    precision=hi) / n
        return jnp.dot(g, m_t, preferred_element_type=jnp.float32,
                       precision=hi)

    dx = inv_c * (dn - group_mean(dn) - n_hat * group_mean(dn * n_hat))
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _img_spec(S: int, C: int):
    return pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _param_spec(C: int):
    # every program reads the same (1, C) scale/bias block
    return pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _partial_spec(C: int):
    # per-program (1, 1, C) dgamma/dbeta partial, one row per image; 3-D so
    # the block's trailing dims equal the array's (Mosaic tiling rule)
    return pl.BlockSpec(
        (1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_act(
    x: Array, scale: Array, bias: Array, groups: int, eps: float,
    act: str = "none", interpret: bool = False,
) -> Array:
    """GroupNorm over (B, S, C) activations, optionally fused with SiLU.

    ``scale``/``bias`` are (C,) fp32 (flax ``nn.GroupNorm`` parameters);
    statistics and the epilogue run in fp32; returns x.dtype.
    """
    out, _ = _fgn_fwd(x, scale, bias, groups, eps, act, interpret)
    return out


def _fgn_call(x, scale, bias, groups, eps, act, interpret):
    B, S, C = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, groups=groups, eps=eps, act=act),
        grid=(B,),
        in_specs=[_img_spec(S, C), _param_spec(C), _param_spec(C)],
        out_specs=_img_spec(S, C),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def _fgn_fwd(x, scale, bias, groups, eps, act, interpret):
    out = _fgn_call(x, scale, bias, groups, eps, act, interpret)
    return out, (x, scale, bias)


def _fgn_bwd(groups, eps, act, interpret, residuals, g):
    x, scale, bias = residuals
    B, S, C = x.shape
    dx, dg_parts, db_parts = pl.pallas_call(
        functools.partial(_bwd_kernel, groups=groups, eps=eps, act=act),
        grid=(B,),
        in_specs=[
            _img_spec(S, C), _param_spec(C), _param_spec(C), _img_spec(S, C),
        ],
        out_specs=(_img_spec(S, C), _partial_spec(C), _partial_spec(C)),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        interpret=interpret,
        # the cotangent keeps its native dtype (fp32 under a fp32 loss):
        # casting it to bf16 here measurably corrupts dscale/dbias sums
    )(x, scale.reshape(1, C), bias.reshape(1, C), g)
    dscale = jnp.sum(dg_parts, axis=(0, 1)).astype(scale.dtype)
    dbias = jnp.sum(db_parts, axis=(0, 1)).astype(bias.dtype)
    return dx, dscale, dbias


fused_group_norm_act.defvjp(_fgn_fwd, _fgn_bwd)


def group_norm_reference(
    x: Array, scale: Array, bias: Array, groups: int, eps: float,
    act: str = "none", norm_dtype=jnp.float32,
) -> Array:
    """flax ``nn.GroupNorm`` semantics (same op order: fast variance
    clamped at 0, ``(x - mean) * (rsqrt * scale) + bias``), + optional
    SiLU. The CPU/mesh fallback path and the kernel's correctness oracle.
    """
    B, S, C = x.shape
    cpg = C // groups
    xf = x.astype(norm_dtype)
    xg = xf.reshape(B, S, groups, cpg)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    var = jnp.maximum(
        jnp.mean(xg * xg, axis=(1, 3)) - mean * mean, 0.0
    )
    mul = jax.lax.rsqrt(var + eps)[:, None, :, None] * scale.astype(
        norm_dtype
    ).reshape(1, 1, groups, cpg)
    y = (xg - mean[:, None, :, None]) * mul + bias.astype(
        norm_dtype
    ).reshape(1, 1, groups, cpg)
    y = y.reshape(B, S, C)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


def use_fused_groupnorm(S: int, C: int, groups: int, dtype=None) -> bool:
    """Fused path: TPU backend, lane-aligned geometry, VMEM-sized tile.

    OPT-IN (``PDM_FUSED_GN=1``): measured END-TO-END SLOWER on the
    flagship UNet on this chip — fwd bs=64 13.4 ms vs 9.0 ms, train step
    bs=128 91.5 ms vs 68.4 ms. The network runs ~50 norms per forward and
    Mosaic's fixed per-pallas_call cost (~0.1-0.2 ms: launch + pipeline
    ramp) exceeds the few-MB HBM round-trip each call saves, while XLA
    fuses the fp32 normalize+SiLU+cast chain into the adjacent convs
    almost for free. The fused-attention kernel wins because it replaces
    8 LARGE calls; this one would replace 50 small ones. Kept because the
    kernel is correct (oracle-tested incl. full VJP) and the economics
    flip on models with fewer, larger norm sites.
    """
    import os

    if os.environ.get("PDM_FUSED_GN", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    # fp32 inputs double the x/do/dx block footprint: the backward at the
    # full bf16 budget measured 18.6 MB scoped VMEM (>16 MB hard limit)
    limit = MAX_FUSED_GN_CELLS
    if dtype is not None and jnp.dtype(dtype).itemsize >= 4:
        limit //= 2
    return (
        C % groups == 0
        and C % 128 == 0
        and S % 8 == 0
        and S * C <= limit
        and groups <= _GROUP_LANES
    )
