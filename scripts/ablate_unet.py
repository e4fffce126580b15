"""Where does the flagship UNet's MFU gap live?

The roofline (ROOFLINE.md) shows this chip's MXU sustains 148-174 TF/s on
the UNet's exact conv shapes, yet the full forward runs ~92 TF/s and the
train step ~89 TF/s. This script ablates the non-conv components on
hardware — attention blocks, GroupNorm, dropout — timing each variant as
``reps`` chained forwards inside one jit (honest tunnel timing), to pin
the gap to a component before optimizing it.

    python scripts/ablate_unet.py [--batch 256] [--reps 20] [--train]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--train", action="store_true",
                    help="also time fwd+bwd per variant")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as nn
    import jax.numpy as jnp

    from pdm_tpu.models.unet import UNet2D

    B, size = args.batch, 32
    flagship = dict(
        in_channels=3, out_channels=3,
        block_out_channels=(128, 256, 256, 256),
        layers_per_block=3, attention_head_dim=64, dropout=0.2,
        norm_eps=1e-6, downsample_padding=0, dtype=jnp.bfloat16,
    )
    variants = {
        "full": dict(flagship),
        "no_attn": dict(
            flagship,
            down_block_types=("DownBlock2D",) * 4,
            up_block_types=("UpBlock2D",) * 4,
            add_mid_attention=False,
        ),
        "no_dropout": dict(flagship, dropout=0.0),
    }

    class _IdentityGN(nn.Module):
        """Stands in for FusedGroupNormAct in the 'no_gn' ablation:
        keeps the params + activation, skips the normalization."""

        num_groups: int = 0
        epsilon: float = 0.0
        act: str = "none"
        dtype: object = None
        norm_dtype: object = None
        fused: bool = True

        @nn.compact
        def __call__(self, x):
            C = x.shape[-1]
            self.param("scale", nn.initializers.ones_init(), (C,))
            self.param("bias", nn.initializers.zeros_init(), (C,))
            if self.act == "silu":
                x = nn.silu(x)
            return x.astype(self.dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((B, size, size, 3)), jnp.float32)
    tau = jnp.asarray(rng.uniform(0.05, 0.95, (B,)), jnp.float32)

    def init_params(net):
        shapes = jax.eval_shape(
            lambda k: net.init(
                k, jnp.zeros((2, size, size, 3)), jnp.zeros((2,))
            )["params"],
            jax.random.PRNGKey(0),
        )
        r = np.random.RandomState(1)
        return jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                r.standard_normal(s.shape).astype(np.float32) * 0.02, s.dtype
            ),
            shapes,
        )

    def time_fwd(net, params):
        @jax.jit
        def loop(params, x, tau):
            def body(i, x):
                out = net.apply(
                    {"params": params}, x.astype(jnp.float32), tau,
                    deterministic=True,
                )
                return x + 0.0 * out  # serialize; consumes full output

            x = jax.lax.fori_loop(0, args.reps, body, x)
            return jnp.sum(x[0, 0, 0, :])

        _ = float(loop(params, x, tau))
        t0 = time.time()
        _ = float(loop(params, x, tau))
        return (time.time() - t0) / args.reps

    def time_train(net, params):
        def loss_fn(p, x, tau):
            out = net.apply(
                {"params": p}, x, tau, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jnp.mean(jnp.square(out))

        grad_fn = jax.value_and_grad(loss_fn)

        @jax.jit
        def loop(params, x, tau):
            def body(i, carry):
                p, acc = carry
                l, g = grad_fn(p, x, tau)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - 0.0 * b.astype(a.dtype), p, g
                )
                return (p, acc + l)

            p, acc = jax.lax.fori_loop(0, args.reps, body, (params, 0.0))
            return acc

        _ = float(loop(params, x, tau))
        t0 = time.time()
        _ = float(loop(params, x, tau))
        return (time.time() - t0) / args.reps

    # FLOPs of the full forward (cost_analysis), for TF/s conversion
    results = {}
    for name, cfg in variants.items():
        net = UNet2D(**cfg)
        params = init_params(net)
        dt = time_fwd(net, params)
        fl = None
        try:
            ca = jax.jit(
                lambda p, xx, tt: net.apply(
                    {"params": p}, xx, tt, deterministic=True
                )
            ).lower(params, x, tau).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            fl = float(ca["flops"])
        except Exception:
            pass
        tf = fl / dt / 1e12 if fl else float("nan")
        results[name] = dt
        print(f"fwd  {name:12s} {dt*1e3:7.2f} ms  {tf:6.1f} TF/s", flush=True)
        if args.train:
            dtt = time_train(net, params)
            print(f"step {name:12s} {dtt*1e3:7.2f} ms", flush=True)

    # no_gn: patch the norm module globally (diagnostic only)
    import pdm_tpu.models.unet as unet_mod

    orig = unet_mod.FusedGroupNormAct
    try:
        unet_mod.FusedGroupNormAct = _IdentityGN
        net = UNet2D(**flagship)
        params = init_params(net)
        dt = time_fwd(net, params)
        print(f"fwd  {'no_gn':12s} {dt*1e3:7.2f} ms", flush=True)
        if args.train:
            dtt = time_train(net, params)
            print(f"step {'no_gn':12s} {dtt*1e3:7.2f} ms", flush=True)
    finally:
        unet_mod.FusedGroupNormAct = orig

    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
