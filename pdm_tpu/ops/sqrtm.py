"""Matrix square root via Newton-Schulz iteration — jit-compiled, MXU-only.

The Frechet distance needs sqrtm(Sigma1 @ Sigma2). SVD (the reference's
route, utils/fid.py:16-18) doesn't map well onto TPU; the Newton-Schulz
coupled iteration is pure matmuls:

    Y_0 = A / ||A||_F,  Z_0 = I
    Y_{k+1} = 0.5 Y_k (3I - Z_k Y_k)
    Z_{k+1} = 0.5 (3I - Z_k Y_k) Z_k
    sqrtm(A) = Y_K * sqrt(||A||_F)

Converges quadratically for SPD-ish A with spectrum in (0, 1] after the
trace normalization. fp32 throughout (2048x2048 covariances).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


@partial(jax.jit, static_argnames=("num_iters",))
def sqrtm_newton_schulz(a: Array, num_iters: int = 20, eps: float = 1e-10) -> Array:
    a = a.astype(jnp.float32)
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a)) + eps
    y = a / norm
    z = jnp.eye(dim, dtype=jnp.float32)
    eye3 = 3.0 * jnp.eye(dim, dtype=jnp.float32)

    # Newton-Schulz is numerically delicate: with the TPU's default
    # (bf16-pass) matmul precision the coupled iteration diverges to NaN.
    # Force full-precision matmuls — three small (F x F) GEMMs per
    # iteration are cheap at FID's 2048-dim covariances.
    hp = jax.lax.Precision.HIGHEST

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - jnp.dot(z, y, preferred_element_type=jnp.float32, precision=hp))
        y_new = jnp.dot(y, t, preferred_element_type=jnp.float32, precision=hp)
        z_new = jnp.dot(t, z, preferred_element_type=jnp.float32, precision=hp)
        return y_new, z_new

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)


@jax.jit
def trace_sqrtm_product(sigma1: Array, sigma2: Array, eps: float = 1e-7) -> Array:
    """tr(sqrtm(Sigma1 @ Sigma2)) with the reference's diagonal jitter."""
    dim = sigma1.shape[0]
    prod = jnp.dot(
        sigma1, sigma2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + eps * jnp.eye(dim, dtype=jnp.float32)
    return jnp.trace(sqrtm_newton_schulz(prod))
