"""Fused Boltzmann-moments op vs dense-materialized oracle, plus the
sharded (dataset-axis over mesh) variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdm_tpu.ops.boltzmann import (
    boltzmann_moments_shard_body,
    boltzmann_moments_xla,
    true_posterior_mean_x0,
    true_score,
)
from pdm_tpu.ops.distance import compute_pw_dist_sqr


def dense_oracle(x, y, inv_temp, y_scale, compute_mean=False):
    """Materialize the full (B, N) energy matrix with numpy float64."""
    x = np.asarray(x, np.float64).reshape(x.shape[0], -1)
    y = np.asarray(y, np.float64).reshape(y.shape[0], -1)
    inv_temp = np.broadcast_to(np.asarray(inv_temp, np.float64), (x.shape[0],))
    y_scale = np.broadcast_to(np.asarray(y_scale, np.float64), (x.shape[0],))
    h = 0.5 * np.sum(
        (x[:, None, :] - y_scale[:, None, None] * y[None, :, :]) ** 2, axis=-1
    )
    g = h * inv_temp[:, None]
    m = (-g).max(axis=1, keepdims=True)
    p = np.exp(-g - m)
    z = p.sum(axis=1)
    log_z = np.log(z) + m[:, 0]
    p = p / z[:, None]
    e1 = (p * g).sum(axis=1)
    e2 = (p * g * g).sum(axis=1)
    mean = p @ y if compute_mean else None
    return log_z, e1, e2 - e1**2, mean


@pytest.mark.parametrize("chunk", [7, 64, 1000])
def test_moments_match_dense(chunk):
    rng = np.random.RandomState(0)
    x = rng.randn(9, 12).astype(np.float32)
    y = rng.randn(123, 12).astype(np.float32)
    inv_temp = rng.uniform(0.5, 5.0, 9).astype(np.float32)
    y_scale = rng.uniform(0.5, 1.5, 9).astype(np.float32)

    out = boltzmann_moments_xla(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(inv_temp), jnp.asarray(y_scale),
        compute_mean=True, chunk_size=chunk,
    )
    log_z, e1, var, mean = dense_oracle(x, y, inv_temp, y_scale, compute_mean=True)
    np.testing.assert_allclose(np.asarray(out.log_z), log_z, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.e1), e1, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.var), var, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.mean), mean, rtol=1e-3, atol=1e-3)


def test_low_temperature_stability():
    """Posterior collapses to the nearest dataset point at T -> 0 without
    overflow (the hard numerics case from SURVEY §7)."""
    rng = np.random.RandomState(1)
    y = rng.randn(50, 16).astype(np.float32)
    x = y[:4] + 1e-3 * rng.randn(4, 16).astype(np.float32)
    out = boltzmann_moments_xla(
        jnp.asarray(x), jnp.asarray(y), inv_temp=1e6, compute_mean=True
    )
    assert np.all(np.isfinite(np.asarray(out.log_z)))
    np.testing.assert_allclose(np.asarray(out.mean), y[:4], atol=1e-3)
    # posterior entropy ~ 0: S = log Z + E[g] - log N -> -log N
    np.testing.assert_allclose(
        np.asarray(out.entropy(50)), -np.log(50), atol=1e-2
    )


def test_high_temperature_limit():
    """At T -> inf the posterior is uniform: S -> 0, mean -> dataset mean."""
    rng = np.random.RandomState(2)
    y = rng.randn(64, 8).astype(np.float32)
    x = rng.randn(3, 8).astype(np.float32)
    out = boltzmann_moments_xla(
        jnp.asarray(x), jnp.asarray(y), inv_temp=1e-7, compute_mean=True
    )
    np.testing.assert_allclose(np.asarray(out.entropy(64)), 0.0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.mean), np.broadcast_to(y.mean(0), (3, 8)), atol=1e-3
    )


def test_pw_dist_matches_direct():
    rng = np.random.RandomState(3)
    x = rng.randn(5, 3, 4).astype(np.float32)
    y = rng.randn(11, 3, 4).astype(np.float32)
    d = np.asarray(compute_pw_dist_sqr(jnp.asarray(x), jnp.asarray(y)))
    direct = ((x.reshape(5, -1)[:, None] - y.reshape(11, -1)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, direct, rtol=1e-4, atol=1e-4)


def test_true_posterior_mean_gaussian_closed_form():
    """For p(x0) = N(0, s0^2 I), E[x0 | xt] = sqrt(ab) s0^2 /
    (ab s0^2 + (1-ab)) * xt. A large sample approximates it."""
    rng = np.random.RandomState(4)
    s0 = 1.0
    data = (s0 * rng.randn(20000, 4)).astype(np.float32)
    log_temp = jnp.asarray([0.5], jnp.float32)
    ab = float(jax.nn.sigmoid(-log_temp[0]))
    xt = jnp.asarray(rng.randn(6, 4).astype(np.float32) * 0.5)
    got = np.asarray(true_posterior_mean_x0(xt, jnp.full((6,), 0.5), jnp.asarray(data)))
    coef = np.sqrt(ab) * s0**2 / (ab * s0**2 + (1 - ab))
    np.testing.assert_allclose(got, coef * np.asarray(xt), atol=0.06)


def test_true_score_gaussian_closed_form():
    """For N(0, s0^2) data, marginal of xt is N(0, ab s0^2 + 1 - ab);
    score(xt) = -xt / (ab s0^2 + 1 - ab)."""
    rng = np.random.RandomState(5)
    data = rng.randn(20000, 4).astype(np.float32)
    lt = 0.3
    ab = 1.0 / (1.0 + np.exp(lt))
    xt = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    got = np.asarray(true_score(xt, jnp.full((8,), lt, jnp.float32), jnp.asarray(data)))
    expected = -np.asarray(xt) / (ab * 1.0 + (1 - ab))
    np.testing.assert_allclose(got, expected, atol=0.08)


def test_sharded_matches_single_device():
    """Dataset axis sharded over 8 virtual devices == single-device result."""
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("data",))
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(16 * 8, 8).astype(np.float32))
    inv_temp = jnp.asarray(rng.uniform(0.5, 2.0, 5).astype(np.float32))

    from jax import shard_map

    fn = shard_map(
        lambda xx, yy, it: boltzmann_moments_shard_body(
            xx, yy, it, axis_name="data", compute_mean=True
        ),
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(x, y, inv_temp)
    ref = boltzmann_moments_xla(x, y, inv_temp, compute_mean=True)
    np.testing.assert_allclose(np.asarray(out.log_z), np.asarray(ref.log_z), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.e1), np.asarray(ref.e1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.var), np.asarray(ref.var), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), rtol=1e-4, atol=1e-4)


def test_precision_policy_resolution(monkeypatch):
    """One knob for all Gram ops (ops/precision.py): override > env > fp32;
    sweep honors PDM_SWEEP_PRECISION first; bad values raise."""
    from pdm_tpu.ops.precision import (
        boltzmann_precision_mode, sweep_precision_mode, xla_dot_precision,
    )

    monkeypatch.delenv("PDM_BOLTZMANN_PRECISION", raising=False)
    monkeypatch.delenv("PDM_SWEEP_PRECISION", raising=False)
    assert boltzmann_precision_mode() == "fp32"
    assert sweep_precision_mode() == "fp32"
    assert boltzmann_precision_mode("bf16") == "bf16"

    monkeypatch.setenv("PDM_BOLTZMANN_PRECISION", "bf16_3x")
    assert boltzmann_precision_mode() == "bf16_3x"
    assert sweep_precision_mode() == "bf16_3x"  # falls back to unified knob
    monkeypatch.setenv("PDM_SWEEP_PRECISION", "bf16")
    assert sweep_precision_mode() == "bf16"  # sweep-specific wins
    assert boltzmann_precision_mode() == "bf16_3x"  # unaffected

    assert xla_dot_precision("fp32") == jax.lax.Precision.HIGHEST
    assert xla_dot_precision("bf16_3x") == jax.lax.Precision.HIGH
    assert xla_dot_precision("bf16") == jax.lax.Precision.DEFAULT

    with pytest.raises(ValueError, match="PDM_BOLTZMANN_PRECISION"):
        boltzmann_precision_mode("tf32")
    monkeypatch.setenv("PDM_BOLTZMANN_PRECISION", "junk")
    with pytest.raises(ValueError):
        boltzmann_precision_mode()


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="the bf16-lowering hazard only exists on TPU hardware",
)
def test_true_posterior_precision_policy_on_tpu():
    """VERDICT r2 weak #2: the analytic denoiser behind TrueDDPM sampling
    (true_posterior_mean_x0 / true_score) must ride the unified fp32 Gram
    default, not XLA's bf16 TPU lowering. float64 host oracle at T=1e-4 on
    unit-scale data; the fp32 default must be tight AND strictly more
    accurate than the bf16 mode."""
    from pdm_tpu.core.temperature import log_temp_from_alpha_bar
    from pdm_tpu.ops.boltzmann import boltzmann_moments_xla

    rng = np.random.RandomState(7)
    B, N, D = 64, 2048, 512
    xh = rng.randn(B, D).astype(np.float32)
    yh = rng.randn(N, D).astype(np.float32)
    T = 1e-4
    ab = 1.0 / (1.0 + T)  # alpha_bar at temperature T
    log_temp = jnp.full((B,), float(np.log(T)), jnp.float32)

    # float64 oracle of E[x0|xt]: softmax over 0.5||x - sqrt(ab) y||^2 / (1-ab)
    x64, y64 = xh.astype(np.float64), yh.astype(np.float64)
    sab = np.sqrt(ab)
    h = 0.5 * (
        (x64 * x64).sum(1)[:, None]
        - 2.0 * sab * (x64 @ y64.T)
        + ab * (y64 * y64).sum(1)[None, :]
    )
    g = -h / (1.0 - ab)
    m = g.max(axis=1, keepdims=True)
    p = np.exp(g - m)
    p /= p.sum(axis=1, keepdims=True)
    mean64 = p @ y64  # (B, D)

    from pdm_tpu.ops.boltzmann import true_posterior_mean_x0

    got_default = np.asarray(
        true_posterior_mean_x0(jnp.asarray(xh), log_temp, jnp.asarray(yh)),
        np.float64,
    )
    inv_temp = jnp.full((B,), float((1.0 + T) / T), jnp.float32)
    got_bf16 = np.asarray(
        boltzmann_moments_xla(
            jnp.asarray(xh), jnp.asarray(yh), inv_temp,
            y_scale=jnp.full((B,), float(sab), jnp.float32),
            compute_mean=True, mxu_precision="bf16",
        ).mean,
        np.float64,
    )
    err_default = np.abs(got_default - mean64).max()
    err_bf16 = np.abs(got_bf16 - mean64).max()
    assert err_default < 1e-3, err_default
    assert err_default < err_bf16, (err_default, err_bf16)
