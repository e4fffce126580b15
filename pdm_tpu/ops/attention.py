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


def _head_mask(h: int, heads: int, C: int, dtype):
    """(1, C) mask selecting head h's channel stripe."""
    hd = C // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    return ((col >= h * hd) & (col < (h + 1) * hd)).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, heads: int,
                scale: float):
    # One grid program per image. Narrow per-head matmuls
    # ((T, hd) @ (hd, T) with hd = 64) run at ~12 TF/s on the MXU — both
    # here and in XLA's lowering — so instead the heads are packed
    # BLOCK-DIAGONALLY: tile K and V `heads` times along rows with a
    # per-head channel mask, giving TWO full-width GEMMs
    # (T, C) @ (C, heads*T) and (T, heads*T) @ (heads*T, C) whose cross-
    # head products are exactly zero. 4x padded FLOPs at ~12x the MXU
    # rate, with every intermediate VMEM-resident.
    T, C = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]  # (T, C) compute dtype
    k = k_ref[0]
    v = v_ref[0]
    k_tiles = jnp.concatenate(
        [k * _head_mask(h, heads, C, k.dtype) for h in range(heads)], axis=0
    )  # (heads*T, C)
    s = jax.lax.dot_general(
        q, k_tiles, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (T, heads*T); block h in columns [h*T, (h+1)*T)
    p_parts = []
    for h in range(heads):
        sh = s[:, h * T : (h + 1) * T]
        m = jnp.max(sh, axis=-1, keepdims=True)
        p = jnp.exp(sh - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p_parts.append((p / denom).astype(q.dtype))
        l_ref[0, h, :] = m[:, 0] + jnp.log(denom[:, 0])  # row logsumexp
    p3 = jnp.concatenate(p_parts, axis=1)  # (T, heads*T)
    v_tiles = jnp.concatenate(
        [v * _head_mask(h, heads, C, v.dtype) for h in range(heads)], axis=0
    )  # (heads*T, C)
    o = jnp.dot(p3, v_tiles, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, l_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, heads: int, scale: float):
    # Same block-diagonal packing as the forward (see _fwd_kernel): the
    # five per-head VJP matmuls become four full-width GEMMs plus masked
    # block-row reductions, with probabilities recomputed from the saved
    # per-head row logsumexp (flash-attention-style recompute).
    T, C = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    masks = [_head_mask(h, heads, C, q.dtype) for h in range(heads)]
    k_tiles = jnp.concatenate([k * m for m in masks], axis=0)  # (HT, C)
    v_tiles = jnp.concatenate([v * m for m in masks], axis=0)
    s = jax.lax.dot_general(
        q, k_tiles, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (T, heads*T)
    p3 = jnp.concatenate(
        [
            jnp.exp(s[:, h * T : (h + 1) * T] - l_ref[0, h, :][:, None])
            for h in range(heads)
        ],
        axis=1,
    ).astype(q.dtype)  # normalized probabilities, (T, heads*T)

    # dv[k, c in h] = sum_t p_h[t, k] do[t, c]
    d1 = jax.lax.dot_general(
        p3, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (heads*T, C)
    dv = sum(
        d1[h * T : (h + 1) * T, :] * masks[h].astype(jnp.float32)
        for h in range(heads)
    )
    # dp[t, hk] = sum_c do[t, c] v_h[k, c]  (v_tiles masking zeroes cross terms)
    dp3 = jax.lax.dot_general(
        do, v_tiles, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, heads*T)
    p3f = p3.astype(jnp.float32)
    pdp = p3f * dp3
    ds3 = jnp.concatenate(
        [
            (
                pdp[:, h * T : (h + 1) * T]
                - p3f[:, h * T : (h + 1) * T]
                * jnp.sum(
                    pdp[:, h * T : (h + 1) * T], axis=-1, keepdims=True
                )
            )
            for h in range(heads)
        ],
        axis=1,
    ).astype(q.dtype)  # (T, heads*T)
    dq = jax.lax.dot_general(
        ds3, k_tiles, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (T, C); k_tiles masking keeps heads separate
    d2 = jax.lax.dot_general(
        ds3, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (heads*T, C)
    dk = sum(
        d2[h * T : (h + 1) * T, :] * masks[h].astype(jnp.float32)
        for h in range(heads)
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


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
