"""Fused GroupNorm(+SiLU) kernel vs flax nn.GroupNorm.

CPU: interpret-mode parity (forward + full VJP incl. scale/bias grads)
against both the in-repo reference implementation and flax's own
nn.GroupNorm. TPU (backend-gated): the compiled Mosaic kernel at the
flagship geometries.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdm_tpu.ops.groupnorm import (
    fused_group_norm_act,
    group_norm_reference,
    use_fused_groupnorm,
)


def jnpasarray(shape, seed, dtype):
    return jnp.asarray(
        np.random.RandomState(seed).standard_normal(shape), dtype
    )


def _flax_oracle(x, scale, bias, groups, eps, act):
    """flax nn.GroupNorm (fp32) + optional SiLU, via bound params."""
    B, S, C = x.shape
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = gn.apply(
        {"params": {"scale": scale, "bias": bias}},
        x.reshape(B, 1, S, C).astype(jnp.float32),
    ).reshape(B, S, C)
    return jax.nn.silu(y) if act == "silu" else y


@pytest.mark.parametrize(
    "B,S,C,groups,act",
    [
        (2, 64, 128, 32, "silu"),
        (2, 64, 128, 32, "none"),
        (1, 16, 384, 32, "silu"),   # flagship up-path concat width
        (3, 32, 256, 8, "none"),
    ],
)
def test_fused_forward_matches_flax(B, S, C, groups, act):
    x = jnpasarray((B, S, C), 0, jnp.float32)
    scale = jnpasarray((C,), 1, jnp.float32) * 0.2 + 1.0
    bias = jnpasarray((C,), 2, jnp.float32) * 0.1
    eps = 1e-6
    want = _flax_oracle(x, scale, bias, groups, eps, act)
    got = fused_group_norm_act(x, scale, bias, groups, eps, act, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    ref = group_norm_reference(x, scale, bias, groups, eps, act)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_fused_vjp_matches_reference():
    B, S, C, groups, eps = 2, 64, 128, 32, 1e-6
    x = jnpasarray((B, S, C), 3, jnp.float32)
    scale = jnpasarray((C,), 4, jnp.float32) * 0.2 + 1.0
    bias = jnpasarray((C,), 5, jnp.float32) * 0.1
    g = jnpasarray((B, S, C), 6, jnp.float32)

    for act in ("silu", "none"):
        def loss_ref(x, s, b):
            return jnp.sum(group_norm_reference(x, s, b, groups, eps, act) * g)

        def loss_fused(x, s, b):
            return jnp.sum(
                fused_group_norm_act(x, s, b, groups, eps, act, True) * g
            )

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        for w, gg, name in zip(want, got, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(w), rtol=3e-4, atol=3e-4,
                err_msg=f"{act}:{name}",
            )


def test_fused_bf16_io():
    """bf16 input/output: stats still fp32-accurate inside the kernel."""
    B, S, C, groups = 2, 256, 256, 32
    x = jnpasarray((B, S, C), 7, jnp.float32)
    scale, bias = jnp.ones((C,)), jnp.zeros((C,))
    want = _flax_oracle(x, scale, bias, groups, 1e-6, "silu")
    got = fused_group_norm_act(
        x.astype(jnp.bfloat16), scale, bias, groups, 1e-6, "silu", True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_gate_geometry(monkeypatch):
    monkeypatch.setenv("PDM_FUSED_GN", "1")  # the gate is opt-in
    assert not use_fused_groupnorm(64, 120, 32)   # C not lane-aligned
    assert not use_fused_groupnorm(63, 128, 32)   # S not sublane-aligned
    assert not use_fused_groupnorm(4096, 512, 32)  # over VMEM budget
    assert not use_fused_groupnorm(64, 128, 256)  # more groups than lanes
    if jax.default_backend() == "tpu":
        assert use_fused_groupnorm(1024, 384, 32)
        assert use_fused_groupnorm(1024, 384, 32, jnp.bfloat16)
        # fp32 inputs at the full budget overflow scoped VMEM (measured)
        assert not use_fused_groupnorm(1024, 384, 32, jnp.float32)
    else:
        assert not use_fused_groupnorm(1024, 384, 32)
    monkeypatch.setenv("PDM_FUSED_GN", "0")
    assert not use_fused_groupnorm(1024, 384, 32)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Mosaic kernel needs TPU"
)
def test_unet_optin_fused_gn_matches_default(monkeypatch):
    """PDM_FUSED_GN=1 swaps every norm site in the UNet for the kernel;
    the forward must match the XLA path to bf16 tolerance (guards the
    opt-in integration against silent divergence)."""
    import numpy as np

    from pdm_tpu.models.unet import UNet2D

    net = UNet2D(
        in_channels=3, out_channels=3, block_out_channels=(128, 128),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=64, dropout=0.0,
        norm_groups=32, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    tau = jnp.asarray([0.2, 0.8], jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, tau)["params"]

    monkeypatch.setenv("PDM_FUSED_GN", "0")
    base = jax.jit(
        lambda p: net.apply({"params": p}, x, tau, deterministic=True)
    )(params)
    monkeypatch.setenv("PDM_FUSED_GN", "1")
    fused = jax.jit(
        lambda p, _flag: net.apply({"params": p}, x, tau, deterministic=True)
    )(params, 1)  # distinct jit signature: avoid reusing the cached graph
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), rtol=0.05, atol=0.05
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Mosaic kernel needs TPU"
)
def test_fused_compiled_on_tpu():
    B, S, C, groups = 4, 1024, 384, 32
    x = jnpasarray((B, S, C), 8, jnp.bfloat16)
    scale = jnpasarray((C,), 9, jnp.float32) * 0.2 + 1.0
    bias = jnpasarray((C,), 10, jnp.float32) * 0.1
    g = jnpasarray((B, S, C), 11, jnp.float32)

    # the reference must reproduce the op's output-dtype boundary: a bf16
    # output means JAX quantizes the incoming cotangent to bf16, exactly
    # like the production XLA path's cast-to-bf16 after the fp32 silu —
    # an fp32-output oracle would see an unquantized cotangent and differ
    # at the bf16 noise level on dscale/dbias sums
    def loss_fused(x, s, b):
        return jnp.sum(
            fused_group_norm_act(x, s, b, groups, 1e-6, "silu")
            .astype(jnp.float32) * g
        )

    def loss_ref(x, s, b):
        return jnp.sum(
            group_norm_reference(x, s, b, groups, 1e-6, "silu")
            .astype(x.dtype).astype(jnp.float32) * g
        )

    lf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))(
        x, scale, bias
    )
    lr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(
        x, scale, bias
    )
    assert np.isfinite(float(lf))
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-2)
    for a, b_, name in zip(gf, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=0.02, atol=0.02, err_msg=name,
        )
