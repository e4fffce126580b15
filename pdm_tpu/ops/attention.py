"""Fused spatial self-attention for the UNet's 16x16 blocks.

Why a kernel: the ablation (scripts/ablate_unet.py, ROOFLINE.md) showed
attention costing 8.6 ms of the flagship's 41 ms forward — 21% of the
step for ~3% of its FLOPs, running at ~48 TF/s because XLA materializes
the (B, heads, T, T) fp32 score tensor in HBM (268 MB per block at
bs=256) and the head split/merge transposes round-trip HBM again.

Shape regime: spatial attention at 16x16 means T = 256 tokens, head_dim
64 — an ENTIRE (T, T) score tile is 256 KB fp32, so one grid program per
(batch, head) holds everything in VMEM: no online-softmax streaming, no
HBM logits, and the bf16 outputs are the only traffic. The kernel reads
Q/K/V directly from the (B, T, C) layout as per-head column stripes
(BlockSpec index maps), eliminating the transpose round trips too.

Backward is the standard softmax-matmul VJP, recomputed from (q, k, v)
and the saved per-row logsumexp — five small VMEM-resident matmuls per
program (flash-attention-style recompute; nothing T x T ever hits HBM).

Parity: replaces the einsum pair in models/unet.py AttentionBlock
(reference: diffusers AttentionProcessor under torch SDPA,
/root/reference/diffusion/ddpm/unet.py:22-27). The XLA einsum path
remains the fallback (CPU, tensor-parallel head sharding) and the
correctness oracle in tests/test_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget: the dominant transients are the (T, heads*T)
# fp32 score/ds tensors (the block-diagonal packing) plus the bf16
# probability and K/V tiles — roughly 10 bytes per (T, heads*T) cell.
# Cap heads*T^2 so that footprint stays well under the ~16 MB/core VMEM
# the Mosaic compiler can schedule around (2^21 cells ~ 20 MB transient
# peak at the flagship's heads=4, T=256: 2.6 MB). Bounding T alone is not
# enough: T=1024 with 4 heads passes a token cap but needs a 16 MB fp32
# score tile alone.
MAX_FUSED_SCORE_CELLS = 1 << 21  # heads * T * T
MAX_FUSED_TOKENS = 1024


def _head_groups(heads: int, hd: int) -> int:
    """Heads packed per K-tile group.

    The MXU contracts 128 lanes at full rate, so a group packs
    ``g = 128 // hd`` heads (capped at ``heads``, and requiring
    ``heads % g == 0``) into one (T, g*hd) x (g*hd, g*T) block-diagonal
    GEMM: the padding factor drops from ``heads`` (round-3 kernel, every
    head block-diagonal in one full-C GEMM: 4x padded FLOPs at the
    flagship's heads=4, hd=64) to ``g`` (2x) — measured at MXU peak on
    padded FLOPs, so halving the padding halves attention wall time.
    """
    if hd >= 128:
        return 1
    g = max(1, 128 // hd)
    g = min(g, heads)
    while heads % g != 0:
        g -= 1
    return g


def _group_mask(j: int, g: int, hd: int, dtype):
    """(1, g*hd) mask selecting local head j's stripe within a group."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, g * hd), 1)
    return ((col >= j * hd) & (col < (j + 1) * hd)).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, heads: int,
                scale: float):
    # One grid program per image. Narrow per-head matmuls
    # ((T, hd) @ (hd, T) with hd = 64) waste MXU lanes, so heads are
    # packed BLOCK-DIAGONALLY in groups of g = 128 // hd: per group, K and
    # V tile g times along rows with a per-head stripe mask, giving one
    # (T, g*hd) @ (g*hd, g*T) score GEMM and one (T, g*T) @ (g*T, g*hd)
    # value GEMM whose cross-head products are exactly zero. g*hd = 128
    # keeps the contraction a full MXU K-tile while cutting the padded
    # FLOPs from heads/1 x to g/1 x (flagship: 4x -> 2x, measured ~2x
    # faster end-to-end on the attention share). Every intermediate is
    # VMEM-resident.
    T, C = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]  # (T, C) compute dtype
    k = k_ref[0]
    v = v_ref[0]
    hd = C // heads
    g = _head_groups(heads, hd)
    o_parts = []
    for g0 in range(0, heads, g):
        cols = slice(g0 * hd, (g0 + g) * hd)
        qg, kg, vg = q[:, cols], k[:, cols], v[:, cols]
        k_tiles = jnp.concatenate(
            [kg * _group_mask(j, g, hd, kg.dtype) for j in range(g)], axis=0
        )  # (g*T, g*hd)
        s = jax.lax.dot_general(
            qg, k_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, g*T); local head j in columns [j*T, (j+1)*T)
        p_parts = []
        for j in range(g):
            sh = s[:, j * T : (j + 1) * T]
            m = jnp.max(sh, axis=-1, keepdims=True)
            p = jnp.exp(sh - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p_parts.append((p / denom).astype(q.dtype))
            l_ref[0, g0 + j, :] = m[:, 0] + jnp.log(denom[:, 0])
        pg = jnp.concatenate(p_parts, axis=1)  # (T, g*T)
        v_tiles = jnp.concatenate(
            [vg * _group_mask(j, g, hd, vg.dtype) for j in range(g)], axis=0
        )  # (g*T, g*hd)
        o_parts.append(
            jnp.dot(pg, v_tiles, preferred_element_type=jnp.float32)
        )
    o = jnp.concatenate(o_parts, axis=1) if len(o_parts) > 1 else o_parts[0]
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, l_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, heads: int, scale: float):
    # Same grouped block-diagonal packing as the forward (see _fwd_kernel):
    # per group of g heads, the five per-head VJP matmuls become four
    # (T, g*hd)-width GEMMs plus masked block-row reductions, with
    # probabilities recomputed from the saved per-head row logsumexp
    # (flash-attention-style recompute).
    T, C = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    hd = C // heads
    g = _head_groups(heads, hd)
    dq_parts, dk_parts, dv_parts = [], [], []
    for g0 in range(0, heads, g):
        cols = slice(g0 * hd, (g0 + g) * hd)
        qg, kg, vg, dog = q[:, cols], k[:, cols], v[:, cols], do[:, cols]
        masks = [_group_mask(j, g, hd, q.dtype) for j in range(g)]
        k_tiles = jnp.concatenate([kg * m for m in masks], axis=0)  # (gT, ghd)
        v_tiles = jnp.concatenate([vg * m for m in masks], axis=0)
        s = jax.lax.dot_general(
            qg, k_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, g*T)
        pg = jnp.concatenate(
            [
                jnp.exp(s[:, j * T : (j + 1) * T] - l_ref[0, g0 + j, :][:, None])
                for j in range(g)
            ],
            axis=1,
        ).astype(q.dtype)  # normalized probabilities, (T, g*T)

        # dv[k, c in j] = sum_t p_j[t, k] do[t, c]
        d1 = jax.lax.dot_general(
            pg, dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (g*T, g*hd)
        dv_parts.append(sum(
            d1[j * T : (j + 1) * T, :] * masks[j].astype(jnp.float32)
            for j in range(g)
        ))
        # dp[t, jk] = sum_c do[t, c] v_j[k, c]  (v_tiles masking zeroes
        # cross terms)
        dpg = jax.lax.dot_general(
            dog, v_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, g*T)
        pf = pg.astype(jnp.float32)
        pdp = pf * dpg
        dsg = jnp.concatenate(
            [
                (
                    pdp[:, j * T : (j + 1) * T]
                    - pf[:, j * T : (j + 1) * T]
                    * jnp.sum(
                        pdp[:, j * T : (j + 1) * T], axis=-1, keepdims=True
                    )
                )
                for j in range(g)
            ],
            axis=1,
        ).astype(q.dtype)  # (T, g*T)
        dq_parts.append(jax.lax.dot_general(
            dsg, k_tiles, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)  # (T, g*hd); k_tiles masking keeps heads separate
        d2 = jax.lax.dot_general(
            dsg, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (g*T, g*hd)
        dk_parts.append(sum(
            d2[j * T : (j + 1) * T, :] * masks[j].astype(jnp.float32)
            for j in range(g)
        ) * scale)

    def cat(parts):
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    dq_ref[0] = cat(dq_parts).astype(dq_ref.dtype)
    dk_ref[0] = cat(dk_parts).astype(dk_ref.dtype)
    dv_ref[0] = cat(dv_parts).astype(dv_ref.dtype)


def _img_spec(T: int, C: int):
    # whole (T, C) activation tile of one image. One image per grid
    # program is deliberate: an experiment batching 8 images per program
    # (static in-kernel loop) measured SLOWER (1.41 vs 1.34 ms fwd, 2.87
    # vs 2.65 ms bwd at B=256) — per-program dispatch is not the
    # bottleneck, and larger blocks reduce Mosaic's copy/compute overlap
    # granularity.
    return pl.BlockSpec(
        (1, T, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )


def _lse_spec(heads: int, T: int):
    return pl.BlockSpec(
        (1, heads, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def fused_spatial_attention(
    q: Array, k: Array, v: Array, heads: int, scale: float,
    interpret: bool = False,
) -> Array:
    """Multi-head softmax attention over (B, T, C) activations.

    ``C = heads * head_dim``; each (batch, head) pair is one grid program
    holding its full (T, T) score tile in VMEM. Returns (B, T, C) in
    q.dtype.
    """
    out, _ = _fsa_fwd(q, k, v, heads, scale, interpret)
    return out


def _fsa_call(q, k, v, heads, scale, interpret):
    B, T, C = q.shape
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        grid=(B,),
        in_specs=[_img_spec(T, C)] * 3,
        out_specs=(_img_spec(T, C), _lse_spec(heads, T)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), q.dtype),
            jax.ShapeDtypeStruct((B, heads, T), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _fsa_fwd(q, k, v, heads, scale, interpret):
    out, lse = _fsa_call(q, k, v, heads, scale, interpret)
    return out, (q, k, v, lse)


def _fsa_bwd(heads, scale, interpret, residuals, g):
    q, k, v, lse = residuals
    B, T, C = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        grid=(B,),
        in_specs=[
            _img_spec(T, C),
            _img_spec(T, C),
            _img_spec(T, C),
            _lse_spec(heads, T),
            _img_spec(T, C),
        ],
        out_specs=(_img_spec(T, C),) * 3,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), q.dtype),
            jax.ShapeDtypeStruct((B, T, C), k.dtype),
            jax.ShapeDtypeStruct((B, T, C), v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, lse, g.astype(q.dtype))
    return dq, dk, dv


fused_spatial_attention.defvjp(_fsa_fwd, _fsa_bwd)


def attention_reference(
    q: Array, k: Array, v: Array, heads: int, scale: float
) -> Array:
    """XLA einsum oracle, numerically identical semantics (fp32 softmax)."""
    B, T, C = q.shape
    hd = C // heads

    def split(t):
        return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C)


def use_fused_attention(T: int, C: int, heads: int) -> bool:
    """Fused path: TPU backend, supported geometry, not disabled by env."""
    import os

    if os.environ.get("PDM_FUSED_ATTN", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    return (
        T <= MAX_FUSED_TOKENS
        and heads * T * T <= MAX_FUSED_SCORE_CELLS
        and C % heads == 0
        and (C // heads) % 8 == 0
        and T % 8 == 0
    )
