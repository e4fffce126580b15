"""Diffusers-checkpoint converter: a synthesized torch-style state dict
(built from diffusers' naming conventions) must convert to EXACTLY the
flax param tree of our UNet2D — bidirectional structure parity."""

import jax
import jax.numpy as jnp
import numpy as np

from pdm_tpu.models.diffusers_import import convert_unet_state_dict
from pdm_tpu.models.unet import unet_from_config


def flax_tree_paths(tree):
    return {
        tuple(str(getattr(p, "key", p)) for p in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def synthesize_torch_sd(flax_params):
    """Invert the converter's mapping: build the torch-style state dict a
    diffusers UNet2DModel with this architecture would have."""
    sd = {}

    def invert_module(path):
        # our flat names -> diffusers module paths
        name = path[0]
        rest = list(path[1:])
        if name in ("conv_in", "conv_out", "conv_norm_out", "time_embedding"):
            parts = [name] + rest
        elif name.startswith("down_") or name.startswith("up_"):
            seg = name.split("_")  # e.g. down, 0, resnet, 1 / down, 0, downsample
            block = "down_blocks" if seg[0] == "down" else "up_blocks"
            idx = seg[1]
            if seg[2] == "resnet":
                parts = [block, idx, "resnets", seg[3]] + rest
            elif seg[2] == "attn":
                parts = [block, idx, "attentions", seg[3]] + rest
            elif seg[2] in ("downsample", "upsample"):
                kind = "downsamplers" if seg[2] == "downsample" else "upsamplers"
                parts = [block, idx, kind, "0"] + rest
            else:
                raise KeyError(name)
        elif name.startswith("mid_resnet_"):
            parts = ["mid_block", "resnets", name[-1]] + rest
        elif name == "mid_attn":
            parts = ["mid_block", "attentions", "0"] + rest
        else:
            raise KeyError(name)
        return parts

    for path, shape in flax_tree_paths(flax_params).items():
        *scope, leaf = path
        parts = invert_module(tuple(scope))
        if leaf == "kernel" and len(shape) == 4:
            h, w, i, o = shape
            sd[".".join(parts) + ".weight"] = np.zeros((o, i, h, w), np.float32)
        elif leaf == "kernel":
            i, o = shape
            sd[".".join(parts) + ".weight"] = np.zeros((o, i), np.float32)
        elif leaf == "scale":
            sd[".".join(parts) + ".weight"] = np.zeros(shape, np.float32)
        else:
            key = ".".join(parts) + ".bias"
            sd[key] = np.zeros(shape, np.float32)
    # diffusers writes attention out-proj as to_out.0
    sd = {
        k.replace(".to_out.weight", ".to_out.0.weight").replace(
            ".to_out.bias", ".to_out.0.bias"
        ): v
        for k, v in sd.items()
    }
    return sd


def test_convert_roundtrip_structure():
    net = unet_from_config(3, {
        "block_out_channels": [32, 64],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 2, "attention_head_dim": 32, "dropout": 0.0,
    })
    # norm_groups must divide channels in the tiny config
    import dataclasses

    net = dataclasses.replace(net, norm_groups=8)
    x = jnp.zeros((1, 16, 16, 3))
    ref = jax.eval_shape(
        lambda k: net.init(k, x, jnp.zeros((1,)))["params"], jax.random.PRNGKey(0)
    )
    sd = synthesize_torch_sd(ref)
    converted = convert_unet_state_dict(sd)
    got = flax_tree_paths(converted)
    want = flax_tree_paths(ref)
    assert got == want, (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5]
    )


def test_converted_values_transpose():
    sd = {"conv_in.weight": np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2),
          "conv_in.bias": np.zeros(2, np.float32)}
    params = convert_unet_state_dict(sd)
    k = np.asarray(params["conv_in"]["kernel"])
    assert k.shape == (2, 2, 3, 2)  # OIHW -> HWIO
    np.testing.assert_array_equal(
        k, np.transpose(sd["conv_in.weight"], (2, 3, 1, 0))
    )


def test_legacy_attention_block_names_migrate():
    """Real google/ddpm-* checkpoints use the deprecated AttentionBlock
    leaf names (query/key/value/proj_attn); the converter must migrate
    them to to_q/to_k/to_v/to_out."""
    sd = {
        "mid_block.attentions.0.query.weight": np.zeros((8, 8), np.float32),
        "mid_block.attentions.0.query.bias": np.zeros((8,), np.float32),
        "mid_block.attentions.0.key.weight": np.zeros((8, 8), np.float32),
        "mid_block.attentions.0.key.bias": np.zeros((8,), np.float32),
        "mid_block.attentions.0.value.weight": np.zeros((8, 8), np.float32),
        "mid_block.attentions.0.value.bias": np.zeros((8,), np.float32),
        "mid_block.attentions.0.proj_attn.weight": np.zeros((8, 8), np.float32),
        "mid_block.attentions.0.proj_attn.bias": np.zeros((8,), np.float32),
        "mid_block.attentions.0.group_norm.weight": np.zeros((8,), np.float32),
        "mid_block.attentions.0.group_norm.bias": np.zeros((8,), np.float32),
    }
    tree = convert_unet_state_dict(sd)
    attn = tree["mid_attn"]
    assert set(attn) == {"to_q", "to_k", "to_v", "to_out", "group_norm"}
    assert set(attn["to_q"]) == {"kernel", "bias"}


def test_unet_from_config_unknown_key_and_diffusers_spellings():
    import pytest

    with pytest.raises(ValueError, match="no effect"):
        unet_from_config(3, {"block_out_chanels": [8, 16]})  # typo

    # diffusers config.json spellings are honored, metadata ignored
    net = unet_from_config(1, {
        "_class_name": "UNet2DModel",
        "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 1,
        "norm_num_groups": 4,
        "add_attention": False,
        "attention_head_dim": None,
        "sample_size": 16,
    })
    assert net.norm_groups == 4
    assert net.add_mid_attention is False
    assert net.attention_head_dim >= 1 << 30  # null => single head


def test_diffusers_ddpm_from_config_local_dir(tmp_path):
    """model_name=diffusers loads a local checkpoint dir (config.json +
    torch .bin), converts, and rescales tau by num_train_timesteps-1."""
    torch = __import__("pytest").importorskip("torch")
    import json

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.models.from_config import ddpm_from_config

    dcfg = {
        "_class_name": "UNet2DModel",
        "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 1,
        "attention_head_dim": 8,
        "norm_num_groups": 4,
        "freq_shift": 1,
        "flip_sin_to_cos": False,
        "downsample_padding": 0,
        "num_train_timesteps": 1000,
    }
    net = unet_from_config(1, dcfg, dtype=jnp.float32)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,))
    )["params"]
    # synthesize the torch checkpoint for this architecture
    sd = synthesize_torch_sd(params)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    with open(ckpt / "config.json", "w") as f:
        json.dump(dcfg, f)
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        ckpt / "diffusion_pytorch_model.bin",
    )

    cfg = load_config()
    cfg.dataset_name = "mnist"
    cfg.ddpm.model_name = "diffusers"
    cfg.ddpm.precision = "f32"
    cfg.ddpm.diffusers_path = str(ckpt)
    ddpm = ddpm_from_config(cfg)
    assert ddpm.tau_scale == 999.0
    out = ddpm.get_predictions(
        jnp.zeros((2, 1, 16, 16)), jnp.zeros((2,))
    )
    assert out.x0.shape == (2, 1, 16, 16)
    assert bool(jnp.all(jnp.isfinite(out.x0)))


def test_unet_from_config_default_only_keys_guard():
    """Behavioral-but-unconsumed diffusers keys must be validated by VALUE:
    a checkpoint with resnet_time_scale_shift='scale_shift' has shape-
    compatible weights, so silently ignoring it would import a behaviorally
    different network (ADVICE.md unet.py finding). Default values pass."""
    import pytest

    # defaults / equivalents are accepted
    net = unet_from_config(1, {
        "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
        "resnet_time_scale_shift": "default",
        "time_embedding_type": "positional",
        "class_embed_type": None,
        "num_class_embeds": None,
        "act_fn": "silu",
        "center_input_sample": False,
        "mid_block_scale_factor": 1,
    })
    assert net.block_out_channels == (8, 16)

    for key, bad in [
        ("resnet_time_scale_shift", "scale_shift"),
        ("time_embedding_type", "fourier"),
        ("class_embed_type", "timestep"),
        ("num_class_embeds", 10),
        ("act_fn", "gelu"),
        ("center_input_sample", True),
        ("mid_block_scale_factor", 0.5),
    ]:
        with pytest.raises(ValueError, match="not supported"):
            unet_from_config(1, {
                "block_out_channels": [8, 16],
                "down_block_types": ["DownBlock2D", "DownBlock2D"],
                "up_block_types": ["UpBlock2D", "UpBlock2D"],
                key: bad,
            })
