"""Fused multi-temperature sweep kernel vs the per-temperature oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.ops.boltzmann import boltzmann_moments_xla
from pdm_tpu.ops.boltzmann_sweep import boltzmann_sweep, boltzmann_sweep_xla


def _case(B=24, N=700, D=20, nt=7, seed=0, values=False):
    rng = np.random.RandomState(seed)
    x0 = jnp.asarray(rng.randn(B, D).astype(np.float32))
    eps = jnp.asarray(rng.randn(B, D).astype(np.float32))
    y = jnp.asarray(rng.randn(N, D).astype(np.float32))
    temps = jnp.asarray(np.logspace(-1.5, 1.5, nt).astype(np.float32))
    v = (
        jnp.asarray(rng.rand(N, 1).astype(np.float32) + 0.1)
        if values
        else None
    )
    return x0, eps, y, temps, v


def test_sweep_xla_matches_per_temp_op():
    """The shared-noise XLA sweep is per-temperature identical to calling
    the single-temperature op with the same xt."""
    x0, eps, y, temps, _ = _case()
    out = boltzmann_sweep_xla(x0, eps, y, temps)
    for i, t in enumerate(np.asarray(temps)):
        ref = boltzmann_moments_xla(
            x0 + jnp.sqrt(t) * eps, y, inv_temp=1.0 / t
        )
        np.testing.assert_allclose(
            np.asarray(out.log_z[i]), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.var[i]), np.asarray(ref.var), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("values", [False, True])
@pytest.mark.parametrize("B,N,D,nt", [(24, 700, 20, 7), (16, 1100, 640, 3)])
def test_sweep_pallas_matches_xla(B, N, D, nt, values):
    x0, eps, y, temps, v = _case(B, N, D, nt, values=values)
    ref = boltzmann_sweep_xla(x0, eps, y, temps, values=v)
    got = boltzmann_sweep(
        x0, eps, y, temps, values=v, mxu_precision="fp32", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got.log_z), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.e1), np.asarray(ref.e1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.var), np.asarray(ref.var), rtol=1e-3, atol=1e-4
    )
    if values:
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(ref.mean), rtol=1e-4, atol=1e-4
        )


def test_sweep_pallas_bf16_3x_close():
    x0, eps, y, temps, _ = _case(16, 900, 48, 5, seed=3)
    ref = boltzmann_sweep_xla(x0, eps, y, temps)
    got = boltzmann_sweep(
        x0, eps, y, temps, mxu_precision="bf16_3x", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got.log_z), np.asarray(ref.log_z), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.entropy(900)), np.asarray(ref.entropy(900)),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU (non-interpret) sweep kernel parity needs a TPU",
)
def test_sweep_pallas_compiled_on_tpu():
    """Backend-gated: the COMPILED sweep kernel vs a float64 host oracle.
    The on-TPU XLA sweep is NOT the truth side here — its fp32 matmuls
    lower to bf16-based passes and its entropy errs up to ~0.7 nats at
    these shapes (PARITY.md) — so the kernel is judged against float64
    and additionally required to be no less accurate than XLA."""
    B, N, D, nt = 64, 4096, 3072, 24
    x0, eps, y, temps, v = _case(B, N, D, nt, seed=5, values=True)

    x64 = np.asarray(x0, np.float64)
    e64 = np.asarray(eps, np.float64)
    y64 = np.asarray(y, np.float64)
    t64 = np.asarray(temps, np.float64)
    ent_64 = np.empty((nt, B))
    for i, t in enumerate(t64):
        xt = x64 + np.sqrt(t) * e64
        h = 0.5 * (
            (xt * xt).sum(1)[:, None]
            - 2.0 * xt @ y64.T
            + (y64 * y64).sum(1)[None, :]
        )
        g = -h / t
        m = g.max(axis=1, keepdims=True)
        w = np.exp(g - m)
        z = w.sum(axis=1)
        p = w / z[:, None]
        log_z = m[:, 0] + np.log(z)
        u_over_t = (p * (-g)).sum(axis=1)
        ent_64[i] = log_z + u_over_t - np.log(N)

    def ent_err(mom):
        return np.abs(np.asarray(mom.entropy(N), np.float64) - ent_64).max()

    xla_err = ent_err(boltzmann_sweep_xla(x0, eps, y, temps, values=v))
    got = boltzmann_sweep(x0, eps, y, temps, values=v)
    kern_err = ent_err(got)
    assert kern_err < 5e-3, f"kernel entropy err {kern_err} vs float64"
    assert kern_err <= xla_err + 1e-3, (kern_err, xla_err)
