"""Fused spatial-attention kernel vs the XLA einsum oracle.

CPU: interpret-mode parity (forward + full VJP). TPU (backend-gated): the
compiled Mosaic kernel at the flagship geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.ops.attention import (
    attention_reference,
    fused_spatial_attention,
    use_fused_attention,
)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.RandomState(seed).standard_normal(shape), dtype
    )


@pytest.mark.parametrize(
    "B,T,heads,hd", [(2, 256, 4, 64), (3, 64, 1, 32), (2, 128, 2, 64)]
)
def test_fused_forward_matches_reference(B, T, heads, hd):
    C = heads * hd
    q, k, v = (_rand((B, T, C), s) for s in (0, 1, 2))
    scale = 1.0 / np.sqrt(hd)
    ref = attention_reference(q, k, v, heads, scale)
    got = fused_spatial_attention(q, k, v, heads, scale, True)
    # On TPU fp32 dots lower to bf16_3x by default, and the kernel's
    # block-diagonal GEMM accumulates in a different order than the
    # per-head einsum oracle, so rounding differs at the ~1e-4 level.
    tol = 2e-5 if jax.default_backend() != "tpu" else 1e-3
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=tol, atol=tol
    )


@pytest.mark.parametrize(
    # (2,128,2,64): one 2-head group; (2,128,4,64): TWO groups — covers
    # the grouped-packing backward's per-group slicing/concat
    "B,T,heads,hd", [(2, 128, 2, 64), (2, 128, 4, 64)]
)
def test_fused_vjp_matches_reference(B, T, heads, hd):
    C = heads * hd
    q, k, v = (_rand((B, T, C), s) for s in (3, 4, 5))
    g = _rand((B, T, C), 6)
    scale = 1.0 / np.sqrt(hd)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, heads, scale) * g)

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_spatial_attention(q, k, v, heads, scale, True) * g
        )

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    # see forward test: TPU bf16_3x fp32 dots + different accumulation
    # order shift the backward by up to ~1e-3 absolute
    tol = 1e-4 if jax.default_backend() != "tpu" else 5e-3
    for name, r, got in zip("qkv", ref_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r), rtol=tol, atol=tol,
            err_msg=f"d{name}",
        )


def test_fused_softmax_stability():
    """Large logits: the row-max subtraction must hold up."""
    B, T, heads, hd = 1, 64, 1, 32
    C = heads * hd
    q = _rand((B, T, C), 7) * 30.0
    k = _rand((B, T, C), 8) * 30.0
    v = _rand((B, T, C), 9)
    scale = 1.0 / np.sqrt(hd)
    ref = attention_reference(q, k, v, heads, scale)
    got = fused_spatial_attention(q, k, v, heads, scale, True)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_use_fused_attention_gating(monkeypatch):
    on_tpu = jax.default_backend() == "tpu"
    assert use_fused_attention(256, 256, 4) == on_tpu
    assert not use_fused_attention(2048, 256, 4)  # too many tokens
    assert not use_fused_attention(256, 255, 4)  # C not divisible
    # VMEM budget: heads*T^2 capped — T=1024 with 4 heads needs a 16 MB
    # fp32 score tile per program and must fall back to XLA
    assert not use_fused_attention(1024, 256, 4)
    assert use_fused_attention(1024, 128, 1) == on_tpu  # 1M cells: fits
    monkeypatch.setenv("PDM_FUSED_ATTN", "0")
    assert not use_fused_attention(256, 256, 4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Mosaic kernel parity needs a TPU",
)
def test_fused_compiled_on_tpu_flagship_shape():
    """Backend-gated: compiled kernel at the flagship geometry (bs x 4
    heads x 256 tokens x 64 head-dim) in bf16, fwd + grads vs the fp32
    einsum oracle."""
    B, T, heads, hd = 64, 256, 4, 64
    C = heads * hd
    q, k, v = (_rand((B, T, C), s, jnp.bfloat16) for s in (0, 1, 2))
    scale = 1.0 / np.sqrt(hd)
    ref = attention_reference(q, k, v, heads, scale)
    got = fused_spatial_attention(q, k, v, heads, scale, False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )

    g = _rand((B, T, C), 6, jnp.bfloat16)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(
                (fn(q, k, v, heads, scale) * g).astype(jnp.float32)
            )

        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    ref_g = loss(lambda *a: attention_reference(*a))(q, k, v)
    got_g = loss(lambda *a: fused_spatial_attention(*a))(q, k, v)
    for name, r, got2 in zip("qkv", ref_g, got_g):
        np.testing.assert_allclose(
            np.asarray(got2, np.float32), np.asarray(r, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=f"d{name}",
        )


# ---------------------------------------------------------------------
# whole-attention-block fused kernel (ops/attention_block.py)
# ---------------------------------------------------------------------

def _block_reference(x, h, w_qkv, b_qkv, w_out, b_out, heads, scale):
    """XLA oracle: qkv proj -> einsum attention -> out proj -> residual."""
    qkv = jnp.dot(h, w_qkv) + b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = attention_reference(q, k, v, heads, scale)
    return x + (jnp.dot(att, w_out) + b_out)


@pytest.mark.parametrize(
    # two grouped-packing regimes: (4 heads, hd 64) = 2 groups;
    # (2, 64) = 1 group; (1, 32) = no grouping
    "B,T,heads,hd", [(2, 256, 4, 64), (2, 128, 2, 64), (2, 64, 1, 32)]
)
def test_fused_block_forward_matches_reference(B, T, heads, hd):
    from pdm_tpu.ops.attention_block import fused_attention_block

    C = heads * hd
    x, h = _rand((B, T, C), 1), _rand((B, T, C), 2)
    w_qkv, b_qkv = _rand((C, 3 * C), 3) * 0.1, _rand((3 * C,), 4) * 0.1
    w_out, b_out = _rand((C, C), 5) * 0.1, _rand((C,), 6) * 0.1
    scale = 1.0 / np.sqrt(hd)
    ref = _block_reference(x, h, w_qkv, b_qkv, w_out, b_out, heads, scale)
    got = fused_attention_block(
        x, h, w_qkv, b_qkv, w_out, b_out, heads, scale, True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("B,T,heads,hd", [(2, 128, 4, 64)])
def test_fused_block_vjp_matches_reference(B, T, heads, hd):
    from pdm_tpu.ops.attention_block import fused_attention_block

    C = heads * hd
    x, h = _rand((B, T, C), 1), _rand((B, T, C), 2)
    w_qkv, b_qkv = _rand((C, 3 * C), 3) * 0.1, _rand((3 * C,), 4) * 0.1
    w_out, b_out = _rand((C, C), 5) * 0.1, _rand((C,), 6) * 0.1
    g = _rand((B, T, C), 7)
    scale = 1.0 / np.sqrt(hd)

    def loss_ref(*a):
        return jnp.sum(_block_reference(*a, heads, scale) * g)

    def loss_fused(*a):
        return jnp.sum(fused_attention_block(*a, heads, scale, True) * g)

    argnums = tuple(range(6))
    ref_grads = jax.grad(loss_ref, argnums=argnums)(
        x, h, w_qkv, b_qkv, w_out, b_out
    )
    got_grads = jax.grad(loss_fused, argnums=argnums)(
        x, h, w_qkv, b_qkv, w_out, b_out
    )
    names = ["dx", "dh", "dw_qkv", "db_qkv", "dw_out", "db_out"]
    for name, r, got in zip(names, ref_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled-kernel path needs TPU"
)
def test_fused_block_compiled_on_tpu_flagship_shape():
    """Compiled whole-block kernel at the flagship attention geometry
    (bf16 activations), fwd + grads vs the fp32 XLA oracle."""
    from pdm_tpu.ops.attention_block import fused_attention_block

    B, T, heads, hd = 64, 256, 4, 64
    C = heads * hd
    x, h = (_rand((B, T, C), s, jnp.bfloat16) for s in (1, 2))
    w_qkv = _rand((C, 3 * C), 3, jnp.bfloat16) * 0.1
    b_qkv = _rand((3 * C,), 4) * 0.1
    w_out = _rand((C, C), 5, jnp.bfloat16) * 0.1
    b_out = _rand((C,), 6) * 0.1
    g = _rand((B, T, C), 7, jnp.bfloat16)
    scale = 1.0 / np.sqrt(hd)

    xf, hf = x.astype(jnp.float32), h.astype(jnp.float32)
    ref = _block_reference(
        xf, hf, w_qkv.astype(jnp.float32), b_qkv,
        w_out.astype(jnp.float32), b_out, heads, scale,
    )
    got = fused_attention_block(
        x, h, w_qkv, b_qkv, w_out, b_out, heads, scale, False
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=5e-2, atol=5e-2
    )

    def loss(hh):
        return jnp.sum(
            (fused_attention_block(
                x, hh, w_qkv, b_qkv, w_out, b_out, heads, scale, False
            ) * g).astype(jnp.float32)
        )

    def loss_ref(hh):
        return jnp.sum(
            _block_reference(
                xf, hh, w_qkv.astype(jnp.float32), b_qkv,
                w_out.astype(jnp.float32), b_out, heads, scale,
            ) * g.astype(jnp.float32)
        )

    dh = jax.grad(loss)(h).astype(jnp.float32)
    dh_ref = jax.grad(loss_ref)(hf)
    np.testing.assert_allclose(
        np.asarray(dh), np.asarray(dh_ref), rtol=8e-2, atol=8e-2
    )
