"""InceptionV3 feature extractor (FID-standard pool-2048 head) in Flax.

Topology follows the torchvision/FID InceptionV3: stem (5 conv + 2 maxpool),
3x InceptionA, InceptionB, 4x InceptionC, InceptionD, 2x InceptionE,
global average pool -> 2048 features. BatchNorm runs in inference mode
(folded running stats), eps 1e-3, no biases on convs — so pretrained torch
weights convert directly (see ``convert_torch_state_dict``).

Input contract (parity with torchmetrics' FID wrapper, which the reference
uses via to_uint8 -> inception): images in [-1, 1], resized to 299x299
bilinear inside the extractor, NCHW at the call surface.

Offline stance: weights load from an .npz produced by the converter; with
no weights available the module still builds (random init) so the FID
machinery is testable end-to-end.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class ConvBN(nn.Module):
    """Conv (no bias) + inference-mode BatchNorm (eps 1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=pad,
            use_bias=False, name="conv",
        )(x)
        # inference BN: scale/bias/mean/var as plain parameters
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_3x3_same(x: Array, *, fid_variant: bool = True) -> Array:
    """3x3 stride-1 avg pool. The FID-standard network (pytorch-fid /
    torchmetrics FIDInceptionA/C/E) uses count_include_pad=FALSE here —
    one of the three deliberate deviations from torchvision that make FID
    numbers comparable across implementations; torchvision's plain
    inception_v3 uses count_include_pad=True."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       count_include_pad=not fid_variant)


def _max_pool_3x3_2(x: Array) -> Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x, fid_variant=self.fid_variant)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x, fid_variant=self.fid_variant)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # FID-standard Mixed_7c (FIDInceptionE_2) pools with a stride-1 MAX
    # pool in the pool branch; Mixed_7b and torchvision use avg
    pool_mode: str = "avg"
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(
                x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)]
            )
        else:
            bp = _avg_pool_3x3_same(x, fid_variant=self.fid_variant)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(B, C, H, W) in [-1, 1] -> (B, 2048) pool features.

    ``fid_variant=True`` (default) reproduces the FID-standard network
    torchmetrics/pytorch-fid evaluate with (count_include_pad=False avg
    pools in A/C/E and a max-pool pool-branch in Mixed_7c); set False for
    plain torchvision inception_v3 semantics (e.g. when converting
    torchvision-trained weights for non-FID use).
    """

    resize_input: bool = True
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # NCHW -> NHWC; grayscale -> RGB
        x = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, 3), method="bilinear"
            )
        # torchvision normalization from [-1,1] input is identity (the FID
        # inception takes inputs scaled to [-1, 1])
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_2(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_2(x)
        x = InceptionA(pool_features=32, fid_variant=self.fid_variant, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, fid_variant=self.fid_variant, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, fid_variant=self.fid_variant, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, fid_variant=self.fid_variant, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, fid_variant=self.fid_variant, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, fid_variant=self.fid_variant, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, fid_variant=self.fid_variant, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(fid_variant=self.fid_variant, name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max" if self.fid_variant else "avg", fid_variant=self.fid_variant, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> 2048


# ---------------------------------------------------------------------------
# weight conversion / IO
# ---------------------------------------------------------------------------


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """torchvision InceptionV3 state_dict -> flax params tree for
    InceptionV3Features. Conv weights transpose OIHW -> HWIO; BN running
    stats fold into the inference-BN parameters."""
    params: dict = {}

    def put(path: Sequence[str], leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(leaf))

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        # e.g. "Mixed_5b.branch1x1.conv.weight" or "Conv2d_1a_3x3.conv.weight"
        *scope, leaf_mod, leaf_name = parts
        flax_scope = scope
        if leaf_mod == "conv" and leaf_name == "weight":
            put([*flax_scope, "conv", "kernel"], np.transpose(val, (2, 3, 1, 0)))
        elif leaf_mod == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(leaf_name)
            if name is not None:
                put([*flax_scope, name], val)
    return params


def save_inception(params: dict, path: str) -> None:
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in k): np.asarray(v)
        for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_inception(path: str) -> Tuple[InceptionV3Features, dict]:
    raw = dict(np.load(path))
    params: dict = {}
    for key, val in raw.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return InceptionV3Features(), params
