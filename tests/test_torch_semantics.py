"""Cross-framework validation of the UNet primitives against torch.

diffusers' UNet2DModel is built from torch Conv2d / GroupNorm / linear
attention primitives; the real package is unavailable offline, so each
primitive our Flax UNet relies on is checked against its torch ground
truth with identical weights (through the converter's layout transposes).
Combined with the committed golden fixture (test_diffusers_golden.py)
this pins the semantics the pretrained-checkpoint import depends on.
Reference call sites: /root/reference/diffusion/ddpm/unet.py:12-31.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from pdm_tpu.models.unet import (  # noqa: E402
    AttentionBlock, Downsample, sinusoidal_time_embedding,
)

RNG = np.random.RandomState(3)


def test_conv3x3_padding1_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 5)).astype(np.float32)
    w = RNG.standard_normal((7, 5, 3, 3)).astype(np.float32)  # OIHW
    b = RNG.standard_normal((7,)).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), padding=1,
    ).numpy().transpose(0, 2, 3, 1)

    conv = nn.Conv(7, (3, 3), padding=1)
    got = conv.apply(
        {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_downsample_padding0_matches_torch():
    """diffusers downsample_padding=0: F.pad(x, (0,1,0,1)) + stride-2 VALID
    conv (Downsample2D.forward)."""
    x = RNG.standard_normal((2, 9, 9, 4)).astype(np.float32)
    w = RNG.standard_normal((6, 4, 3, 3)).astype(np.float32)
    b = RNG.standard_normal((6,)).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
    ref = torch.nn.functional.conv2d(
        xt, torch.from_numpy(w), torch.from_numpy(b), stride=2,
    ).numpy().transpose(0, 2, 3, 1)

    ds = Downsample(6, padding=0)
    got = ds.apply(
        {"params": {"conv": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b)}}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_groupnorm_matches_torch():
    x = RNG.standard_normal((3, 6, 6, 8)).astype(np.float32)
    scale = RNG.standard_normal((8,)).astype(np.float32)
    bias = RNG.standard_normal((8,)).astype(np.float32)

    gn_t = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        gn_t.weight.copy_(torch.from_numpy(scale))
        gn_t.bias.copy_(torch.from_numpy(bias))
    ref = gn_t(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 1)

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    got = gn.apply(
        {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_attention_block_matches_torch():
    """Our AttentionBlock vs a torch mirror of the deprecated diffusers
    AttnBlock: GN -> per-token q/k/v -> heads (C // head_dim) ->
    softmax(qk/sqrt(hd)) v -> out proj -> residual."""
    B, H, W, C, head_dim = 2, 4, 4, 16, 8
    x = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    params = {
        "group_norm": {
            "scale": RNG.standard_normal((C,)).astype(np.float32),
            "bias": RNG.standard_normal((C,)).astype(np.float32),
        },
    }
    for name in ("to_q", "to_k", "to_v", "to_out"):
        params[name] = {
            "kernel": (RNG.standard_normal((C, C)) * 0.2).astype(np.float32),
            "bias": RNG.standard_normal((C,)).astype(np.float32),
        }

    blk = AttentionBlock(head_dim=head_dim, norm_groups=4, norm_eps=1e-6)
    got = blk.apply({"params": params}, jnp.asarray(x))

    # torch mirror
    xt = torch.from_numpy(x.reshape(B, H * W, C))
    gn = torch.nn.GroupNorm(4, C, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(params["group_norm"]["scale"]))
        gn.bias.copy_(torch.from_numpy(params["group_norm"]["bias"]))
    h = gn(xt.transpose(1, 2)).transpose(1, 2)

    def lin(name, t):
        w = torch.from_numpy(params[name]["kernel"].T)  # torch (out, in)
        b = torch.from_numpy(params[name]["bias"])
        return torch.nn.functional.linear(t, w, b)

    heads = C // head_dim
    hd = C // heads
    q, k, v = lin("to_q", h), lin("to_k", h), lin("to_v", h)

    def split(t):
        return t.reshape(B, H * W, heads, hd).transpose(1, 2)

    out = torch.nn.functional.scaled_dot_product_attention(
        split(q), split(k), split(v)
    )
    out = out.transpose(1, 2).reshape(B, H * W, C)
    out = lin("to_out", out)
    ref = (xt + out).detach().numpy().reshape(B, H, W, C)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    """diffusers get_timestep_embedding (embeddings.py), freq_shift as
    downscale_freq_shift, both sin/cos orders."""
    t = np.asarray([0.0, 1.0, 17.5, 999.0], np.float32)
    dim, max_period = 32, 10_000.0
    for flip in (False, True):
        for shift in (0.0, 1.0):
            half = dim // 2
            exponent = -math.log(max_period) * np.arange(half, dtype=np.float64)
            exponent = exponent / (half - shift)
            emb = t[:, None].astype(np.float64) * np.exp(exponent)[None]
            ref = (
                np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
                if flip
                else np.concatenate([np.sin(emb), np.cos(emb)], axis=-1)
            )
            got = sinusoidal_time_embedding(
                jnp.asarray(t), dim, flip_sin_to_cos=flip, freq_shift=shift
            )
            np.testing.assert_allclose(
                np.asarray(got), ref, rtol=1e-4, atol=1e-5
            )
