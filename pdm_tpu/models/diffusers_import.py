"""Import pretrained diffusers ``UNet2DModel`` torch checkpoints into the
framework's Flax UNet2D.

Capability parity: the reference's third model family, DDPMDiffusers
(``diffusion/ddpm/diffusers_model.py``) — a pretrained pipeline UNet used
for sampling experiments (e.g. google/ddpm-* checkpoints). This stack is
torch-free on the compute path, so instead of wrapping a live torch
module, the weights convert once into the native Flax parameter tree
(offline: reads a local state dict; no network).

Name mapping (diffusers -> pdm_tpu.models.unet.UNet2D):
  conv_in / conv_out / conv_norm_out            -> same
  time_embedding.linear_{1,2}                   -> time_embedding.linear_{1,2}
  down_blocks.{i}.resnets.{j}.*                 -> down_{i}_resnet_{j}.*
  down_blocks.{i}.attentions.{j}.*              -> down_{i}_attn_{j}.*
  down_blocks.{i}.downsamplers.0.conv           -> down_{i}_downsample.conv
  mid_block.resnets.{0,1} / attentions.0        -> mid_resnet_{0,1} / mid_attn
  up_blocks.{i}.resnets.{j} / attentions.{j}    -> up_{i}_resnet_{j} / up_{i}_attn_{j}
  up_blocks.{i}.upsamplers.0.conv               -> up_{i}_upsample.conv
  attention to_out.0                            -> to_out
  legacy AttentionBlock query/key/value/proj_attn -> to_q/to_k/to_v/to_out

Tensor layout: conv OIHW -> HWIO; linear (out, in) -> (in, out);
norm weight/bias -> scale/bias.
"""

from __future__ import annotations

import re
from typing import Dict

import jax.numpy as jnp
import numpy as np

_LEAF_MAP = {
    ("weight", 4): ("kernel", lambda w: np.transpose(w, (2, 3, 1, 0))),
    ("weight", 2): ("kernel", lambda w: np.transpose(w, (1, 0))),
    ("weight", 1): ("scale", lambda w: w),
    ("bias", 1): ("bias", lambda w: w),
}

_MODULE_RULES = [
    (re.compile(r"^conv_in\.(.*)$"), r"conv_in.\1"),
    (re.compile(r"^conv_out\.(.*)$"), r"conv_out.\1"),
    (re.compile(r"^conv_norm_out\.(.*)$"), r"conv_norm_out.\1"),
    (re.compile(r"^time_embedding\.linear_(\d)\.(.*)$"),
     r"time_embedding.linear_\1.\2"),
    (re.compile(r"^down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$"),
     r"down_\1_resnet_\2.\3"),
    (re.compile(r"^down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$"),
     r"down_\1_attn_\2.\3"),
    (re.compile(r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$"),
     r"down_\1_downsample.conv.\2"),
    (re.compile(r"^mid_block\.resnets\.(\d)\.(.*)$"), r"mid_resnet_\1.\2"),
    (re.compile(r"^mid_block\.attentions\.0\.(.*)$"), r"mid_attn.\1"),
    (re.compile(r"^up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$"),
     r"up_\1_resnet_\2.\3"),
    (re.compile(r"^up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$"),
     r"up_\1_attn_\2.\3"),
    (re.compile(r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$"),
     r"up_\1_upsample.conv.\2"),
]


def _map_module_path(torch_key: str) -> str:
    key = torch_key.replace("to_out.0.", "to_out.")
    # real google/ddpm-* Hub checkpoints predate diffusers' Attention
    # refactor and store the deprecated AttentionBlock leaf names
    # (query/key/value/proj_attn); migrate them like diffusers' own
    # checkpoint-version shim does. These substrings only occur inside
    # attention modules, so blanket replacement is safe.
    key = (
        key.replace(".query.", ".to_q.")
        .replace(".key.", ".to_k.")
        .replace(".value.", ".to_v.")
        .replace(".proj_attn.", ".to_out.")
    )
    for pat, repl in _MODULE_RULES:
        if pat.match(key):
            return pat.sub(repl, key)
    raise KeyError(f"unmapped diffusers key: {torch_key}")


def convert_unet_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """diffusers UNet2DModel state_dict (numpy values) -> flax params tree
    for pdm_tpu.models.unet.UNet2D."""
    params: dict = {}
    for torch_key, val in state_dict.items():
        val = np.asarray(val)
        flax_key = _map_module_path(torch_key)
        *scope, leaf = flax_key.split(".")
        name, transform = _LEAF_MAP[(leaf, val.ndim)]
        node = params
        for p in scope:
            node = node.setdefault(p, {})
        node[name] = jnp.asarray(transform(val))
    return params


def load_diffusers_unet(path: str) -> dict:
    """Load + convert a torch UNet2DModel checkpoint file (.bin/.pth via
    torch, or .safetensors via safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore

        sd = load_file(path)
    else:
        import torch  # type: ignore

        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
    return convert_unet_state_dict(sd)
