"""UNet2D denoiser in Flax — the flagship trainable model.

Architecture-parity target: the diffusers ``UNet2DModel`` the reference
wraps (``diffusion/ddpm/unet.py:12-31``) with the reference experiment
config (``config/groups/ddpm.yaml``): sinusoidal time embedding
(freq_shift=1, sin-then-cos), block channels 128/256/256/256 with 3 ResNet
layers per block, self-attention at 16x16 with head dim 64, GroupNorm(32,
eps 1e-6), SiLU, dropout 0.2, zero-pad-right stride-2 downsampling
(downsample_padding=0), nearest-neighbor x2 + conv upsampling, mid block
resnet-attn-resnet.

TPU-first design decisions:
  * NHWC layout end-to-end (XLA's native conv layout on TPU; the reference
    is NCHW).
  * All matmuls/convs take a ``dtype`` compute policy (bf16 on TPU for the
    MXU) with fp32 params and fp32 softmax/GroupNorm statistics.
  * Attention is one fused ``einsum`` pair per block at 16x16x256 — XLA maps
    it straight onto the MXU; no custom kernel needed at this size.
  * The time embedding MLP runs in fp32 (cheap, numerically sensitive).

The model takes continuous ``tau in [0, 1]`` (the reference feeds tau
directly into the diffusers timestep embedding, unet.py:30-31).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def sinusoidal_time_embedding(
    timesteps: Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = False,
    freq_shift: float = 1.0,
    max_period: float = 10_000.0,
) -> Array:
    """Transformer-style sinusoidal embedding of (possibly fractional)
    timesteps. Matches diffusers ``get_timestep_embedding`` semantics
    (downscale_freq_shift = freq_shift)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoidal embedding (fp32)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t_sinusoidal: Array) -> Array:
        h = nn.Dense(self.embed_dim, name="linear_1")(t_sinusoidal)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, name="linear_2")(h)


class FusedGroupNormAct(nn.Module):
    """GroupNorm (+ optional SiLU) with ``nn.GroupNorm``'s parameter tree
    (scale/bias under this module's name — checkpoint-compatible).

    Default path: a flax-identical fp32 norm (XLA fuses the
    normalize+SiLU+cast chain into the adjacent convs). With
    ``PDM_FUSED_GN=1`` on TPU it runs the one-pass Pallas kernel
    (ops/groupnorm.py) instead — measured SLOWER end-to-end on the
    flagship (50 small pallas_calls pay more fixed dispatch than they
    save in HBM traffic; see use_fused_groupnorm), so opt-in only.
    """

    num_groups: int
    epsilon: float
    act: str = "none"  # "silu" | "none"
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        scale = self.param("scale", nn.initializers.ones_init(), (C,))
        bias = self.param("bias", nn.initializers.zeros_init(), (C,))
        from ..ops.groupnorm import (
            fused_group_norm_act, group_norm_reference, use_fused_groupnorm,
        )

        if self.fused and use_fused_groupnorm(
            H * W, C, self.num_groups, dtype=x.dtype
        ):
            y = fused_group_norm_act(
                x.reshape(B, H * W, C), scale, bias, self.num_groups,
                self.epsilon, self.act,
            )
        else:
            y = group_norm_reference(
                x.reshape(B, H * W, C), scale, bias, self.num_groups,
                self.epsilon, self.act, norm_dtype=self.norm_dtype,
            )
        return y.reshape(B, H, W, C).astype(self.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float
    norm_groups: int
    norm_eps: float
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    fused_groupnorm: bool = True

    def _norm_act(self, name):
        return FusedGroupNormAct(
            num_groups=self.norm_groups, epsilon=self.norm_eps, act="silu",
            dtype=self.dtype, norm_dtype=self.norm_dtype,
            fused=self.fused_groupnorm, name=name,
        )

    @nn.compact
    def __call__(self, x: Array, temb: Array, *, deterministic: bool) -> Array:
        in_ch = x.shape[-1]
        h = self._norm_act("norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", dtype=self.dtype)(h)

        t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=self.dtype)(
            nn.silu(temb).astype(self.dtype)
        )
        h = h + t[:, None, None, :]

        h = self._norm_act("norm2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", dtype=self.dtype)(h)

        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), name="conv_shortcut", dtype=self.dtype
            )(x)
        return x + h


class _ProjParams(nn.Module):
    """Owns one Dense-shaped (kernel, bias) pair WITHOUT running a GEMM —
    lets AttentionBlock keep the exact nn.Dense parameter tree
    (to_q/to_k/to_v/{kernel,bias}, diffusers-import compatible) while the
    forward fuses all three projections into one 3C-wide GEMM. Separate
    256-wide GEMMs run at ~53 TF/s on this chip (narrow-N MXU regime,
    ROOFLINE.md) vs ~159 TF/s at >=512-wide."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class AttentionBlock(nn.Module):
    """Single-image spatial self-attention (the deprecated-style attn block
    with residual connection and fp32 softmax)."""

    head_dim: int
    norm_groups: int
    norm_eps: float
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    # optional NamedSharding for (B, heads, S, hd) tensors: tensor-parallel
    # attention shards the head axis over the mesh 'model' axis
    head_sharding: Any = None
    # see UNet2D.fused_attention: must be False under a multi-device mesh
    fused_attention: bool = True
    fused_groupnorm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        heads = max(1, C // self.head_dim)
        hd = C // heads
        h = FusedGroupNormAct(
            num_groups=self.norm_groups, epsilon=self.norm_eps, act="none",
            dtype=self.dtype, norm_dtype=self.norm_dtype,
            fused=self.fused_groupnorm, name="group_norm",
        )(x)
        h = h.reshape(B, H * W, C)
        wq, bq = _ProjParams(C, name="to_q")(C)
        wk, bk = _ProjParams(C, name="to_k")(C)
        wv, bv = _ProjParams(C, name="to_v")(C)
        w_qkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
        b_qkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)

        from ..ops.attention import (
            fused_spatial_attention, use_fused_attention,
        )
        from ..ops.attention_block import (
            fused_attention_block, use_fused_attention_block,
        )

        scale = 1.0 / math.sqrt(hd)
        if self.fused_attention and self.head_sharding is None and (
            use_fused_attention_block(H * W, C, heads)
        ):
            # whole-block kernel: qkv-proj + attention + out-proj +
            # residual in one pallas call, activations read/written once
            # (the narrow-N projection GEMMs are HBM-bound under XLA)
            wout, bout = _ProjParams(C, name="to_out")(C)
            out = fused_attention_block(
                x.reshape(B, H * W, C), h,
                w_qkv, jnp.concatenate([bq, bk, bv]),
                wout.astype(self.dtype), bout, heads, scale,
            )
            return out.reshape(B, H, W, C)

        qkv = jnp.dot(h, w_qkv) + b_qkv  # one (B*T, C) @ (C, 3C) GEMM
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.fused_attention and self.head_sharding is None and use_fused_attention(
            H * W, C, heads
        ):
            # one VMEM-resident Pallas program per (batch, head): no HBM
            # score tensor, no head split/merge transposes — measured 21%
            # of the flagship forward under the XLA einsum path
            # (scripts/ablate_unet.py, ROOFLINE.md)
            out = fused_spatial_attention(q, k, v, heads, scale)
        else:
            # XLA fallback: CPU, tensor-parallel head sharding, odd shapes
            def split(t):
                t = t.reshape(B, H * W, heads, hd).transpose(0, 2, 1, 3)
                if self.head_sharding is not None and heads > 1:
                    t = jax.lax.with_sharding_constraint(t, self.head_sharding)
                return t

            qh, kh, vh = split(q), split(k), split(v)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
            out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = nn.Dense(C, name="to_out", dtype=self.dtype)(out)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    """Stride-2 conv; with pad_mode 'zero_right' replicates diffusers'
    downsample_padding=0 behavior (asymmetric (0,1,0,1) zero pad + VALID)."""

    channels: int
    padding: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = self.padding
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad, name="conv",
            dtype=self.dtype,
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv", dtype=self.dtype)(x)


class UNet2D(nn.Module):
    """Config mirror of diffusers UNet2DModel for the reference experiments.

    ``down_block_types`` entries: "DownBlock2D" | "AttnDownBlock2D";
    ``up_block_types``: "UpBlock2D" | "AttnUpBlock2D". Input/output NHWC.
    """

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 256, 256)
    down_block_types: Sequence[str] = (
        "DownBlock2D", "AttnDownBlock2D", "DownBlock2D", "DownBlock2D"
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D"
    )
    layers_per_block: int = 3
    attention_head_dim: int = 64
    dropout: float = 0.2
    norm_groups: int = 32
    norm_eps: float = 1e-6
    freq_shift: float = 1.0
    flip_sin_to_cos: bool = False
    add_mid_attention: bool = True
    downsample_padding: int = 0
    dtype: Any = jnp.float32
    # Keep fp32 GroupNorm: measured on v5e, bf16 group-norm reductions hit
    # a pathological XLA lowering (6.5 s/step vs 0.2 s/step on the flagship
    # train step) — the casts around fp32 norms are the fast path.
    norm_dtype: Any = jnp.float32
    # Tensor parallelism (optional): NamedSharding for NHWC activations
    # (channel axis over 'model'), applied at block boundaries so GSPMD
    # keeps channel-sharded layouts through the convs instead of
    # all-gathering activations; and for attention (B, heads, S, hd)
    # tensors (head axis over 'model'). Set via parallel.mesh.unet_with_tp.
    act_sharding: Any = None
    head_sharding: Any = None
    # Pallas fused attention (ops/attention.py). Disable for MESH runs:
    # GSPMD cannot partition the Mosaic custom call, so a batch-sharded
    # pjit step would all-gather full q/k/v activations around it (or
    # fail to lower) — the XLA einsum path partitions cleanly. The
    # config factory (ddpm_from_config) clears this automatically when
    # config.parallel requests a multi-device mesh.
    fused_attention: bool = True
    # Pallas fused GroupNorm+SiLU (ops/groupnorm.py). Same mesh caveat as
    # fused_attention; cleared alongside it by the config factory.
    fused_groupnorm: bool = True

    def _constrain(self, h: Array) -> Array:
        if self.act_sharding is not None:
            return jax.lax.with_sharding_constraint(h, self.act_sharding)
        return h

    @nn.compact
    def __call__(self, x: Array, tau: Array, *, deterministic: bool = True) -> Array:
        ch0 = self.block_out_channels[0]
        temb = sinusoidal_time_embedding(
            tau, ch0, flip_sin_to_cos=self.flip_sin_to_cos,
            freq_shift=self.freq_shift,
        )
        temb = TimeEmbedding(embed_dim=ch0 * 4, name="time_embedding")(temb)

        fused_gn = self.fused_groupnorm and self.act_sharding is None

        def resnet(out_ch, name):
            return ResnetBlock(
                out_channels=out_ch, dropout=self.dropout,
                norm_groups=self.norm_groups, norm_eps=self.norm_eps,
                dtype=self.dtype, norm_dtype=self.norm_dtype, name=name,
                fused_groupnorm=fused_gn,
            )

        def attn(name):
            return AttentionBlock(
                head_dim=self.attention_head_dim, norm_groups=self.norm_groups,
                norm_eps=self.norm_eps, dtype=self.dtype,
                norm_dtype=self.norm_dtype, name=name,
                head_sharding=self.head_sharding,
                fused_attention=self.fused_attention,
                fused_groupnorm=fused_gn,
            )

        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in", dtype=self.dtype)(
            x.astype(self.dtype)
        )
        h = self._constrain(h)
        skips = [h]

        # ---- down path ----
        n_blocks = len(self.block_out_channels)
        for i, (btype, out_ch) in enumerate(
            zip(self.down_block_types, self.block_out_channels)
        ):
            for j in range(self.layers_per_block):
                h = resnet(out_ch, f"down_{i}_resnet_{j}")(
                    h, temb, deterministic=deterministic
                )
                if btype == "AttnDownBlock2D":
                    h = attn(f"down_{i}_attn_{j}")(h)
                h = self._constrain(h)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample(
                    out_ch, self.downsample_padding, dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(h)
                h = self._constrain(h)
                skips.append(h)

        # ---- mid ----
        mid_ch = self.block_out_channels[-1]
        h = resnet(mid_ch, "mid_resnet_0")(h, temb, deterministic=deterministic)
        if self.add_mid_attention:
            h = attn("mid_attn")(h)
        h = resnet(mid_ch, "mid_resnet_1")(h, temb, deterministic=deterministic)
        h = self._constrain(h)

        # ---- up path ----
        for i, btype in enumerate(self.up_block_types):
            out_ch = self.block_out_channels[::-1][i]
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = resnet(out_ch, f"up_{i}_resnet_{j}")(
                    h, temb, deterministic=deterministic
                )
                if btype == "AttnUpBlock2D":
                    h = attn(f"up_{i}_attn_{j}")(h)
                h = self._constrain(h)
            if i < n_blocks - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
                h = self._constrain(h)

        assert not skips, f"unconsumed skip connections: {len(skips)}"

        h = FusedGroupNormAct(
            num_groups=self.norm_groups, epsilon=self.norm_eps, act="silu",
            dtype=self.dtype, norm_dtype=self.norm_dtype, fused=fused_gn,
            name="conv_norm_out",
        )(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out",
                    dtype=self.dtype)(h)
        return h.astype(jnp.float32)


# diffusers config.json carries metadata/keys with no counterpart in this
# architecture; everything NOT here and not consumed below is an error
# (silently dropping an unknown key would build a different network than
# the config describes)
_IGNORED_UNET_KEYS = {
    "_class_name", "_diffusers_version", "in_channels", "out_channels",
    "sample_size", "num_train_timesteps",
}

# Keys this architecture does not consume but whose NON-default values
# change network behavior (diffusers UNet2DModel semantics): a checkpoint
# with e.g. resnet_time_scale_shift='scale_shift' has shape-compatible
# weights, so silently ignoring it would import a behaviorally different
# network. Each maps to its set of accepted (equivalent-to-our-behavior)
# values.
_DEFAULT_ONLY_UNET_KEYS: Dict[str, tuple] = {
    "act_fn": ("silu",),
    "center_input_sample": (False,),
    "time_embedding_type": ("positional",),
    "resnet_time_scale_shift": ("default",),
    "class_embed_type": (None,),
    "num_class_embeds": (None,),
    "attn_norm_num_groups": (None,),
    "mid_block_scale_factor": (1, 1.0),
}

_KNOWN_UNET_KEYS = {
    "block_out_channels", "down_block_types", "up_block_types",
    "layers_per_block", "attention_head_dim", "dropout", "norm_eps",
    "freq_shift", "flip_sin_to_cos", "downsample_padding",
    "norm_groups", "norm_num_groups", "add_mid_attention", "add_attention",
}


def unet_from_config(
    image_channels: int,
    unet_config: Optional[Dict[str, Any]] = None,
    dtype: Any = jnp.float32,
) -> UNet2D:
    """Build a UNet2D from a reference-style unet_config dict
    (config/groups/ddpm.yaml keys) or a diffusers UNet2DModel config.json
    dict (norm_num_groups / add_attention spellings accepted)."""
    cfg = dict(unet_config or {})
    unknown = (
        set(cfg) - _KNOWN_UNET_KEYS - _IGNORED_UNET_KEYS
        - set(_DEFAULT_ONLY_UNET_KEYS)
    )
    if unknown:
        raise ValueError(
            f"unet_config keys with no effect on this architecture: "
            f"{sorted(unknown)} (known: {sorted(_KNOWN_UNET_KEYS)})"
        )
    for key, accepted in _DEFAULT_ONLY_UNET_KEYS.items():
        if key in cfg and cfg[key] not in accepted:
            raise ValueError(
                f"unet_config[{key!r}]={cfg[key]!r} is not supported by this "
                f"architecture (accepted: {accepted}); importing such a "
                f"checkpoint would silently build a behaviorally different "
                f"network"
            )
    norm_groups = int(
        cfg.get("norm_groups", cfg.get("norm_num_groups", 32))
    )
    add_mid_attention = bool(
        cfg.get("add_mid_attention", cfg.get("add_attention", True))
    )
    return UNet2D(
        norm_groups=norm_groups,
        add_mid_attention=add_mid_attention,
        in_channels=image_channels,
        out_channels=image_channels,
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 256, 256))),
        down_block_types=tuple(
            cfg.get(
                "down_block_types",
                ("DownBlock2D", "AttnDownBlock2D", "DownBlock2D", "DownBlock2D"),
            )
        ),
        up_block_types=tuple(
            cfg.get(
                "up_block_types",
                ("UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
            )
        ),
        layers_per_block=int(cfg.get("layers_per_block", 3)),
        # diffusers semantics: attention_head_dim null => ONE head per
        # attention (old AttentionBlock default); a huge head_dim makes
        # heads = max(1, C // head_dim) = 1 at every width
        attention_head_dim=(
            1 << 30
            if cfg.get("attention_head_dim", 64) is None
            else int(cfg.get("attention_head_dim", 64))
        ),
        dropout=float(cfg.get("dropout", 0.2)),
        norm_eps=float(cfg.get("norm_eps", 1e-6)),
        freq_shift=float(cfg.get("freq_shift", 1.0)),
        flip_sin_to_cos=bool(cfg.get("flip_sin_to_cos", False)),
        downsample_padding=int(cfg.get("downsample_padding", 0)),
        dtype=dtype,
    )
