"""High-resolution (256x256) model-family probe on the real chip.

The dataset registry carries three 256x256 datasets (celeba-hq,
celeba-hq-256-30k, lsun-bedrooms — reference config/dataset_configs.py:
102-150), whose reference path is the pretrained diffusers pipeline
(google/ddpm-celebahq-256). This script instantiates that checkpoint's
architecture (from its published config.json values) in the native Flax
UNet and measures, single-chip:

  * forward latency/throughput at sampler batch sizes (bf16), and
  * the full donated train step (noise->fwd->bwd->adam->EMA),

with the same chained-in-one-jit timing discipline as scripts/roofline.py
(per-call timing through the axon tunnel is unreliable). Parameter count
and per-step activation-memory headroom contextualize where spatial
parallelism (--parallel.model_partition spatial) becomes necessary.

Run: python scripts/highres_probe.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup_jax  # noqa: E402

# google/ddpm-celebahq-256 UNet2DModel config (architecture constants from
# the public checkpoint's config.json; reference loads it via
# diffusion/ddpm/diffusers_model.py:6-19)
CELEBAHQ_UNET = {
    "block_out_channels": [128, 128, 256, 256, 512, 512],
    "down_block_types": [
        "DownBlock2D", "DownBlock2D", "DownBlock2D",
        "DownBlock2D", "AttnDownBlock2D", "DownBlock2D",
    ],
    "up_block_types": [
        "UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
        "UpBlock2D", "UpBlock2D", "UpBlock2D",
    ],
    "layers_per_block": 2,
    "attention_head_dim": None,  # one head per attn (legacy AttentionBlock)
    "dropout": 0.0,
    "norm_eps": 1e-6,
    "freq_shift": 1,
    "flip_sin_to_cos": False,
    "downsample_padding": 0,
}

SIZE = 256
MEASURED_PEAK_TFLOPS = 184.0  # ROOFLINE.md best bf16


def count_params(params):
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def fwd_flops_per_image(cfg, size, in_ch=3, temb_dim=None):
    """Analytic forward FLOPs (2*H*W*Cin*Cout*k^2 per conv; attention as
    qkv/out GEMMs + 2 score GEMMs). The compiled cost_analysis through the
    axon backend undercounts conv FLOPs ~6x, so this is the honest MFU
    denominator (cross-checked against the level geometry by hand)."""
    chans = list(cfg["block_out_channels"])
    L = int(cfg["layers_per_block"])
    down = list(cfg["down_block_types"])
    up = list(cfg["up_block_types"])
    temb_dim = temb_dim or chans[0] * 4

    def conv(h, cin, cout, k=3):
        return 2.0 * h * h * cin * cout * k * k

    def attn(h, c):
        s = h * h
        return 4 * 2 * s * c * c + 2 * 2 * s * s * c

    f = conv(size, in_ch, chans[0])
    skip_ch = [chans[0]]
    h, cin = size, chans[0]
    for i, c in enumerate(chans):
        for _ in range(L):
            f += conv(h, cin, c) + conv(h, c, c) + 2 * temb_dim * c
            if cin != c:
                f += conv(h, cin, c, 1)
            cin = c
            skip_ch.append(c)
            if down[i] == "AttnDownBlock2D":
                f += attn(h, c)
        if i < len(chans) - 1:
            f += conv((h + 1) // 2, c, c)
            h //= 2
            skip_ch.append(c)
    f += 2 * conv(h, cin, cin) * 2 + attn(h, cin)  # mid: res-attn-res
    for i, c in enumerate(reversed(chans)):
        for _ in range(L + 1):
            sc = skip_ch.pop()
            f += conv(h, cin + sc, c) + conv(h, c, c) + conv(h, cin + sc, c, 1)
            f += 2 * temb_dim * c
            cin = c
            if up[i] == "AttnUpBlock2D":
                f += attn(h, c)
        if i < len(chans) - 1:
            h *= 2
            f += conv(h, c, c)
    f += conv(size, chans[0], in_ch)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.models.unet import unet_from_config
    from pdm_tpu.models.unet_ddpm import init_unet_ddpm
    from pdm_tpu.schedulers.analytic import LinearBetaScheduler
    from pdm_tpu.diffusion.trainer import DDPMTrainer

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    net = unet_from_config(3, CELEBAHQ_UNET, dtype=jnp.bfloat16)
    sched = LinearBetaScheduler(1e-4, 2.478e4)
    ddpm = init_unet_ddpm(
        jax.random.PRNGKey(0), sched, net, (3, SIZE, SIZE),
        parametrization="eps",
    )
    n_params = count_params(ddpm.params)
    flops_img = fwd_flops_per_image(CELEBAHQ_UNET, SIZE)
    print(f"params: {n_params/1e6:.1f}M (celebahq-256 architecture), "
          f"fwd {flops_img/1e9:.0f} GFLOPs/image", flush=True)

    # ---- forward (sampler regime), chained in one jit ----
    def fwd_probe(batch, reps):
        x0 = jax.random.normal(
            jax.random.PRNGKey(1), (batch, SIZE, SIZE, 3), jnp.float32
        )
        tau = jnp.full((batch,), 0.5, jnp.float32)

        @jax.jit
        def loop(params, x):
            def body(i, x):
                y = net.apply({"params": params}, x, tau, deterministic=True)
                # feed the output back (same shape as input) to serialize
                return x + 0.0 * y

            x = jax.lax.fori_loop(0, reps, body, x)
            return jnp.sum(x[0, 0, 0, :])

        compiled = loop.lower(ddpm.params, x0).compile()
        _ = float(compiled(ddpm.params, x0))
        t0 = time.time()
        _ = float(compiled(ddpm.params, x0))
        dt = (time.time() - t0) / reps
        tf = flops_img * batch / dt / 1e12
        print(
            f"fwd  bs={batch:3d}: {dt*1e3:8.1f} ms/step  "
            f"{batch/dt:7.1f} img/s  {tf:5.1f} TF/s "
            f"({tf/MEASURED_PEAK_TFLOPS:.2f} of measured peak)",
            flush=True,
        )
        return batch / dt, tf

    fwd_rows = {}
    for bs, reps in ([(4, 8), (16, 4)] if args.quick else
                     [(4, 12), (8, 8), (16, 6), (32, 3)]):
        try:
            fwd_rows[bs] = fwd_probe(bs, reps)
        except Exception as e:  # OOM at some batch is itself the datapoint
            print(f"fwd  bs={bs}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
            break

    # ---- train step (donated, full optimizer), chained via fori_loop ----
    trainer = DDPMTrainer(
        ddpm=ddpm, learning_rate=2e-5, warmup_steps=10, total_iters=100,
        grad_clip=1.0, ema_decay=0.9999,
    )

    def train_probe(batch, reps):
        step_fn = trainer._build_train_step()
        x = jax.random.normal(
            jax.random.PRNGKey(2), (batch, 3, SIZE, SIZE), jnp.float32
        )
        state = trainer.init_state()

        # chain `reps` REAL optimizer steps in one dispatch: fori_loop over
        # the (inlined) jitted train step — state carried, x an argument
        # (never closure-capture data: it becomes an HLO constant), loss
        # read back fences the clock
        @jax.jit
        def loop(state, key, x):
            def body(i, carry):
                state, _ = carry
                state, metrics = step_fn(state, jax.random.fold_in(key, i), x)
                return (state, metrics["loss"])

            return jax.lax.fori_loop(0, reps, body, (state, jnp.float32(0)))

        # warm TWICE: at these shapes the first executable's output state
        # re-keys the jit cache once (XLA picks output layouts that differ
        # from the inputs'; the second compile is the layout fixed point —
        # measured 179 s of compile masquerading as a 38 s/step "train
        # step" until this was diagnosed with jax_log_compiles). Steady
        # state is call 3 onward.
        out = loop(state, jax.random.PRNGKey(3), x)
        _ = float(out[1])
        out = loop(out[0], jax.random.PRNGKey(4), x)
        _ = float(out[1])
        t0 = time.time()
        out = loop(out[0], jax.random.PRNGKey(5), x)
        _ = float(out[1])
        dt = (time.time() - t0) / reps
        tf = 3.0 * flops_img * batch / dt / 1e12
        print(
            f"step bs={batch:3d}: {dt*1e3:8.1f} ms/step  "
            f"{batch/dt:7.1f} img/s  {tf:5.1f} TF/s "
            f"({tf/MEASURED_PEAK_TFLOPS:.2f} of measured peak)",
            flush=True,
        )
        return batch / dt

    step_rows = {}
    for bs, reps in ([(4, 4)] if args.quick else [(4, 6), (8, 4), (16, 3)]):
        try:
            step_rows[bs] = train_probe(bs, reps)
        except Exception as e:
            print(f"step bs={bs}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
            break

    best_fwd = max(fwd_rows.values(), key=lambda v: v[0]) if fwd_rows else (0, 0)
    print(json.dumps({
        "arch": "ddpm-celebahq-256",
        "params_m": round(n_params / 1e6, 1),
        "fwd_img_per_sec": {str(b): round(v[0], 2) for b, v in fwd_rows.items()},
        "fwd_tflops_best": round(best_fwd[1], 1),
        "train_img_per_sec": {str(b): round(v, 2) for b, v in step_rows.items()},
        "device": dev.device_kind,
    }), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
