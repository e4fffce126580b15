"""Pallas Boltzmann kernel vs the XLA oracle (interpret mode on CPU).

The default ``bf16_3x`` MXU precision has the same error profile as XLA's
fp32 matmul lowering on TPU (~2^-16 relative on the Gram), so against the
CPU oracle (exact fp32) the posterior mean can differ at ~1e-4 where the
softmax is peaked — the fp32 mode is bit-faithful and tested tightly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.ops.boltzmann import boltzmann_moments_xla
from pdm_tpu.ops.boltzmann_pallas import boltzmann_moments_pallas


@pytest.mark.parametrize("B,N,D", [(9, 200, 12), (128, 1024, 64), (5, 300, 1)])
def test_pallas_matches_xla(B, N, D):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    y = jnp.asarray(rng.randn(N, D).astype(np.float32))
    inv_temp = jnp.asarray(rng.uniform(0.5, 3.0, B).astype(np.float32))
    y_scale = jnp.asarray(rng.uniform(0.5, 1.5, B).astype(np.float32))

    ref = boltzmann_moments_xla(x, y, inv_temp, y_scale, compute_mean=True)
    got = boltzmann_moments_pallas(
        x, y, inv_temp, y_scale, compute_mean=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got.log_z), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.e1), np.asarray(ref.e1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(ref.var), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("B,N,D", [(16, 700, 40), (128, 1024, 640)])
def test_pallas_fp32_mode_matches_xla_tightly(B, N, D):
    """fp32 MXU mode against the fp32 CPU oracle: tight tolerances,
    including a D large enough to exercise the D-tiled grid (TD=512)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    y = jnp.asarray(rng.randn(N, D).astype(np.float32))
    inv_temp = jnp.asarray(rng.uniform(0.5, 3.0, B).astype(np.float32))

    ref = boltzmann_moments_xla(x, y, inv_temp, compute_mean=True)
    got = boltzmann_moments_pallas(
        x, y, inv_temp, compute_mean=True, mxu_precision="fp32",
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.log_z), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.e1), np.asarray(ref.e1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(ref.var), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean), rtol=1e-4, atol=1e-4)


def test_pallas_no_mean_and_values_payload():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(130, 8).astype(np.float32))
    ref = boltzmann_moments_xla(x, y, 2.0)
    got = boltzmann_moments_pallas(x, y, 2.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got.log_z), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5)
    assert got.mean is None

    vals = jnp.asarray(rng.randn(130, 3).astype(np.float32))
    ref_v = boltzmann_moments_xla(x, y, 2.0, values=vals)
    got_v = boltzmann_moments_pallas(x, y, 2.0, values=vals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_v.mean), np.asarray(ref_v.mean), rtol=1e-3, atol=1e-3
    )


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real-TPU (non-interpret) kernel parity needs a TPU",
)
def test_pallas_compiled_on_tpu_matches_xla():
    """Backend-gated: the COMPILED Mosaic kernel at flagship-like shapes
    (D-tiled grid, both precisions), judged against a float64 host oracle —
    NOT against the on-TPU XLA path, which is itself the less accurate
    side for the cancellation-prone variance (see PARITY.md: the fused
    kernel beats XLA's accuracy). The kernel must (a) match the oracle and
    (b) be no less accurate than XLA on every moment."""
    rng = np.random.RandomState(3)
    B, N, D = 256, 4096, 3072
    xh = rng.randn(B, D).astype(np.float32)
    yh = rng.randn(N, D).astype(np.float32)
    ith = rng.uniform(0.05, 2.0, B).astype(np.float32)
    x, y, inv_temp = jnp.asarray(xh), jnp.asarray(yh), jnp.asarray(ith)

    # float64 oracle (exact pairwise energies, stable shifted softmax)
    x64, y64 = xh.astype(np.float64), yh.astype(np.float64)
    h = 0.5 * (
        (x64 * x64).sum(1)[:, None]
        - 2.0 * x64 @ y64.T
        + (y64 * y64).sum(1)[None, :]
    )
    g = -ith.astype(np.float64)[:, None] * h
    m = g.max(axis=1, keepdims=True)
    w = np.exp(g - m)
    z = w.sum(axis=1)
    log_z_64 = m[:, 0] + np.log(z)
    p = w / z[:, None]
    e1_64 = (p * (-g)).sum(axis=1)
    var_64 = (p * (-g - e1_64[:, None]) ** 2).sum(axis=1)

    def errs(mom):
        return (
            np.abs(np.asarray(mom.log_z, np.float64) - log_z_64).max(),
            np.abs(np.asarray(mom.e1, np.float64) - e1_64).max()
            / max(1.0, np.abs(e1_64).max()),
            np.abs(np.asarray(mom.var, np.float64) - var_64).max()
            / max(1.0, var_64.max()),
        )

    xla_lz, xla_e1, xla_var = errs(boltzmann_moments_xla(x, y, inv_temp))
    # measured on v5e: XLA (0.56, 1.0e-4, 0.024); bf16_3x identical error
    # profile by construction; fp32 mode ~750x tighter (7.6e-4, 1.4e-7,
    # 2.1e-5)
    bounds = {"bf16_3x": (1.5, 5e-4, 5e-2), "fp32": (5e-3, 1e-5, 1e-3)}
    for prec, (b_lz, b_e1, b_var) in bounds.items():
        got = boltzmann_moments_pallas(x, y, inv_temp, mxu_precision=prec)
        lz, e1, var = errs(got)
        assert lz < b_lz, f"{prec}: log_z err {lz}"
        assert e1 < b_e1, f"{prec}: e1 rel err {e1}"
        assert var < b_var, f"{prec}: var rel err {var}"
        # never less accurate than the on-TPU XLA path
        assert lz <= 2 * xla_lz + 5e-3, (prec, lz, xla_lz)
        assert e1 <= 2 * xla_e1 + 1e-6, (prec, e1, xla_e1)
        assert var <= 2 * xla_var + 1e-4, (prec, var, xla_var)
