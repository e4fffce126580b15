"""Whole-attention-block fused kernel: QKV projection + multi-head
attention + output projection + residual in ONE pallas call.

Why (round-4 decomposition): with the grouped-packing attention kernel in
place, the remaining attention cost in the flagship train step is NOT the
softmax GEMMs — it is the projection GEMMs and their HBM round trips.
Per block at bs=128 the XLA path writes+reads qkv (50 MB), the attention
output (33 MB) and the out-projection activations; the projections
themselves are narrow-N GEMMs ((32k, 256) @ (256, 256) measures ~53 TF/s
on this chip, ROOFLINE.md conclusion 3) because they are HBM-bound at
N=256. One grid program per image holds the whole chain in VMEM: read the
post-norm activations ONCE (128 KB bf16), run qkv-proj -> grouped
attention -> out-proj -> residual add entirely in registers/VMEM, write
the block output ONCE. Weight gradients accumulate in VMEM scratch across
the (sequential on TPU) grid and are written once by the last program.

The grouped head packing is shared with ops/attention.py (g = 128 // hd
heads per block-diagonal GEMM — 2x padded FLOPs at the flagship's
heads=4/hd=64 instead of 4x).

Parity target: AttentionBlock's XLA path in models/unet.py — GroupNorm
output -> fused qkv GEMM -> per-head fp32 softmax -> out Dense ->
residual (reference: diffusers AttentionBlock under torch SDPA,
/root/reference/diffusion/ddpm/unet.py:22-27). The GroupNorm itself stays
outside (XLA's fp32 norm fuses into the producer; measured ~0.9 ms of the
step — not worth the VJP complexity here).

Backward: standard chain VJP with flash-style recompute — qkv and the
softmax probabilities are recomputed from the saved per-head row
logsumexp, so nothing (T, heads*T)-shaped ever hits HBM in either pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import MAX_FUSED_SCORE_CELLS, MAX_FUSED_TOKENS, \
    _group_mask, _head_groups


def _grouped_attention_fwd(q, k, v, heads, hd, scale, lse_out=None):
    """(T, C) q/k/v -> (T, C) fp32 attention output; optionally records
    per-head row logsumexp into ``lse_out[0, h, :]`` (a VMEM ref)."""
    T = q.shape[0]
    g = _head_groups(heads, hd)
    o_parts = []
    for g0 in range(0, heads, g):
        cols = slice(g0 * hd, (g0 + g) * hd)
        qg, kg, vg = q[:, cols], k[:, cols], v[:, cols]
        k_tiles = jnp.concatenate(
            [kg * _group_mask(j, g, hd, kg.dtype) for j in range(g)], axis=0
        )
        s = jax.lax.dot_general(
            qg, k_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p_parts = []
        for j in range(g):
            sh = s[:, j * T : (j + 1) * T]
            m = jnp.max(sh, axis=-1, keepdims=True)
            p = jnp.exp(sh - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p_parts.append((p / denom).astype(q.dtype))
            if lse_out is not None:
                lse_out[0, g0 + j, :] = m[:, 0] + jnp.log(denom[:, 0])
        pg = jnp.concatenate(p_parts, axis=1)
        v_tiles = jnp.concatenate(
            [vg * _group_mask(j, g, hd, vg.dtype) for j in range(g)], axis=0
        )
        o_parts.append(
            jnp.dot(pg, v_tiles, preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(o_parts, axis=1) if len(o_parts) > 1 else o_parts[0]


def _qkv(h, w_qkv_ref, b_qkv_ref, C):
    qkv = jnp.dot(
        h, w_qkv_ref[...], preferred_element_type=jnp.float32
    ) + b_qkv_ref[...]
    qkv = qkv.astype(h.dtype)
    return qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]


def _fwd_kernel(x_ref, h_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                o_ref, l_ref, *, heads: int, scale: float):
    T, C = h_ref.shape[1], h_ref.shape[2]
    hd = C // heads
    h = h_ref[0]
    q, k, v = _qkv(h, wqkv_ref, bqkv_ref, C)
    att = _grouped_attention_fwd(q, k, v, heads, hd, scale, lse_out=l_ref)
    out = jnp.dot(
        att.astype(h.dtype), wout_ref[...],
        preferred_element_type=jnp.float32,
    ) + bout_ref[...]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + out).astype(o_ref.dtype)


def _bwd_kernel(h_ref, wqkv_ref, bqkv_ref, wout_ref, l_ref, do_ref,
                dh_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                *, heads: int, scale: float):
    """One program per image; weight grads accumulate in fp32 output
    blocks that every program maps to (TPU grid is sequential)."""
    T, C = h_ref.shape[1], h_ref.shape[2]
    hd = C // heads
    g = _head_groups(heads, hd)
    h = h_ref[0]
    do = do_ref[0].astype(jnp.float32)
    q, k, v = _qkv(h, wqkv_ref, bqkv_ref, C)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    # ---- out projection VJP (needs att recomputed) --------------------
    do_b = do.astype(h.dtype)
    datt = jax.lax.dot_general(
        do_b, wout_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)  # (T, C)
    att = _grouped_attention_fwd(q, k, v, heads, hd, scale)
    dwout_ref[...] += jax.lax.dot_general(
        att.astype(h.dtype), do_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbout_ref[...] += jnp.sum(do, axis=0, keepdims=True)

    # ---- attention VJP (grouped, probabilities from saved lse) --------
    dq_parts, dk_parts, dv_parts = [], [], []
    for g0 in range(0, heads, g):
        cols = slice(g0 * hd, (g0 + g) * hd)
        qg, kg, vg, dog = q[:, cols], k[:, cols], v[:, cols], datt[:, cols]
        masks = [_group_mask(j, g, hd, q.dtype) for j in range(g)]
        k_tiles = jnp.concatenate([kg * m for m in masks], axis=0)
        v_tiles = jnp.concatenate([vg * m for m in masks], axis=0)
        s = jax.lax.dot_general(
            qg, k_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        pg = jnp.concatenate(
            [
                jnp.exp(s[:, j * T : (j + 1) * T] - l_ref[0, g0 + j, :][:, None])
                for j in range(g)
            ],
            axis=1,
        ).astype(q.dtype)
        d1 = jax.lax.dot_general(
            pg, dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_parts.append(sum(
            d1[j * T : (j + 1) * T, :] * masks[j].astype(jnp.float32)
            for j in range(g)
        ))
        dpg = jax.lax.dot_general(
            dog, v_tiles, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
        ).astype(q.dtype)
        dq_parts.append(jax.lax.dot_general(
            dsg, k_tiles, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        d2 = jax.lax.dot_general(
            dsg, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_parts.append(sum(
            d2[j * T : (j + 1) * T, :] * masks[j].astype(jnp.float32)
            for j in range(g)
        ) * scale)

    def cat(parts):
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    dqkv = jnp.concatenate(
        [cat(dq_parts), cat(dk_parts), cat(dv_parts)], axis=1
    ).astype(h.dtype)  # (T, 3C)

    # ---- qkv projection VJP --------------------------------------------
    dh_ref[0] = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dh_ref.dtype)  # (T, C)
    dwqkv_ref[...] += jax.lax.dot_general(
        h, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)


def _img_spec(T: int, C: int):
    return pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(rows: int, cols: int):
    # every program reads/accumulates the same weight block
    return pl.BlockSpec((rows, cols), lambda b: (0, 0),
                        memory_space=pltpu.VMEM)


def _lse_spec(heads: int, T: int):
    return pl.BlockSpec((1, heads, T), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_attention_block(
    x: Array, h: Array, w_qkv: Array, b_qkv: Array, w_out: Array,
    b_out: Array, heads: int, scale: float, interpret: bool = False,
) -> Array:
    """x + out_proj(attention(qkv_proj(h))) over (B, T, C) activations.

    ``x`` is the pre-norm residual input, ``h`` the post-GroupNorm
    activations; ``w_qkv`` (C, 3C) / ``w_out`` (C, C) in the compute
    dtype, biases fp32. Returns (B, T, C) in x.dtype.
    """
    out, _ = _fab_fwd(x, h, w_qkv, b_qkv, w_out, b_out, heads, scale,
                      interpret)
    return out


def _fab_fwd(x, h, w_qkv, b_qkv, w_out, b_out, heads, scale, interpret):
    B, T, C = h.shape
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        grid=(B,),
        in_specs=[
            _img_spec(T, C), _img_spec(T, C),
            _w_spec(C, 3 * C), _w_spec(1, 3 * C),
            _w_spec(C, C), _w_spec(1, C),
        ],
        out_specs=(_img_spec(T, C), _lse_spec(heads, T)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, heads, T), jnp.float32),
        ),
        interpret=interpret,
    )(x, h, w_qkv, b_qkv.reshape(1, 3 * C), w_out, b_out.reshape(1, C))
    return out, (h, w_qkv, b_qkv, w_out, b_out, lse)


def _fab_bwd(heads, scale, interpret, residuals, g):
    h, w_qkv, b_qkv, w_out, b_out, lse = residuals
    B, T, C = h.shape
    dh, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        grid=(B,),
        in_specs=[
            _img_spec(T, C),
            _w_spec(C, 3 * C), _w_spec(1, 3 * C), _w_spec(C, C),
            _lse_spec(heads, T), _img_spec(T, C),
        ],
        out_specs=(
            _img_spec(T, C),
            _w_spec(C, 3 * C), _w_spec(1, 3 * C),
            _w_spec(C, C), _w_spec(1, C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), h.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(h, w_qkv, b_qkv.reshape(1, 3 * C), w_out, lse, g.astype(h.dtype))
    # residual passthrough: d(x) = g exactly.
    # b_out's grad is a plain sum of the cotangent over (B, T); taking it
    # from the kernel would sum the bf16-rounded copy of g (~12% rel err
    # at B=128,T=256 under heavy cancellation — hardware parity run,
    # scripts/verify_attention_block.json). Reduce the unrounded g in
    # fp32 instead; XLA fuses the reduction, the kernel's dbout output is
    # ignored.
    dbout_exact = jnp.sum(
        g.astype(jnp.float32), axis=(0, 1), keepdims=False
    )
    del dbout
    return (
        g,
        dh,
        dwqkv.astype(w_qkv.dtype),
        dbqkv.reshape(b_qkv.shape).astype(b_qkv.dtype),
        dwout.astype(w_out.dtype),
        dbout_exact.reshape(b_out.shape).astype(b_out.dtype),
    )


fused_attention_block.defvjp(_fab_fwd, _fab_bwd)


def use_fused_attention_block(T: int, C: int, heads: int) -> bool:
    """Gate: TPU backend, fused-attention geometry, plus the projection
    weights must fit the per-program VMEM budget. Opt-in via
    PDM_FUSED_BLOCK=1 until the compiled kernel is hardware-verified
    (interpret-mode parity is green; the TPU parity test + step timing
    run once the chip frees up) — the standalone attention kernel remains
    the default."""
    import os

    if os.environ.get("PDM_FUSED_BLOCK", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return (
        T <= MAX_FUSED_TOKENS
        and heads * T * T <= MAX_FUSED_SCORE_CELLS
        and C % heads == 0
        and (C // heads) % 8 == 0
        and T % 8 == 0
        and C <= 512  # (C, 3C) weights + transients in VMEM
    )
