"""Separate true per-step device time from fixed per-call overhead.

Round-4 anomaly: the SAME flagship UNet forward measures ~99 TF/s at
bs=128 (train_decompose.py fwd_net, reps=10) but ~198 TF/s at bs=256
(ablate_unet.py, reps=20). Per-sample FLOPs are batch-independent
(15.66 GF, checked at bs=64/128/256 via cost_analysis), so either the
chip genuinely doubles conv efficiency at bs=256, or a fixed per-call
cost (axon tunnel round-trip + dispatch + readback) inflates timings
with few chained reps — reps=10 at 20 ms/rep means a 100 ms call; a
~100 ms fixed overhead would exactly produce the observed 2x.

Protocol: ONE compile per (program, batch) with a DYNAMIC trip count
(fori_loop over a traced bound lowers to while_loop, so `n` is a
runtime argument — no recompile between n values), then time
n in {4, 8, 16, 32, 64}: a linear fit gives slope = true ms/step and
intercept = ms/call overhead.

Programs: pure net forward (fwd) and the production donated train step
(step), each at bs=128 and bs=256.

Run: python scripts/overhead_probe.py [--programs fwd,step]
     [--batches 128,256] [--ns 4,8,16,32,64]
Writes scripts/overhead_probe.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", default="fwd,step")
    ap.add_argument("--batches", default="128,256")
    ap.add_argument("--ns", default="4,8,16,32,64")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test; the axon "
                         "sitecustomize otherwise registers the TPU)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _zeros_params
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet_ddpm import UNetDDPM

    net, sched, size = _flagship()
    params0 = _zeros_params(net, size)
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda z: jnp.asarray(
            rng.standard_normal(z.shape).astype(np.float32) * 0.02, z.dtype
        ),
        params0,
    )
    ns = [int(s) for s in args.ns.split(",")]
    # per-sample forward FLOPs measured at runtime (same protocol as
    # bench.py) so the TF/s and mfu rows stay consistent with the rest of
    # the repo's figures; falls back to the last measured constant
    fwd_flops_per_sample = 15.48e9
    try:
        _fb = 64
        _ca = jax.jit(
            lambda p, xx, tt: net.apply({"params": p}, xx, tt,
                                        deterministic=True)
        ).lower(
            params,
            jnp.zeros((_fb, size, size, 3), jnp.bfloat16),
            jnp.full((_fb,), 0.5, jnp.float32),
        ).compile().cost_analysis()
        _ca = _ca[0] if isinstance(_ca, list) else _ca
        fwd_flops_per_sample = float(_ca["flops"]) / _fb
    except Exception as e:
        print(f"[probe] cost_analysis failed ({e}); using "
              f"{fwd_flops_per_sample:.3g} F/sample", file=sys.stderr)
    results = {}

    def fit(times_ms):
        # least-squares line through (n, total_ms)
        xs = np.asarray(ns, np.float64)
        ys = np.asarray(times_ms, np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        return float(slope), float(intercept)

    for batch in [int(b) for b in args.batches.split(",")]:
        x_nhwc = jnp.asarray(
            rng.standard_normal((batch, size, size, 3)).astype(np.float32)
        )
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        tau = jnp.full((batch,), 0.5, jnp.float32)

        if "fwd" in args.programs:
            @jax.jit
            def fwd_loop(p, x, n):
                def body(i, xc):
                    out = net.apply({"params": p}, xc, tau,
                                    deterministic=True)
                    return out.astype(xc.dtype)

                xr = jax.lax.fori_loop(0, n, body, x)
                return jnp.sum(xr[0, 0, 0, :])

            t0 = time.time()
            _ = float(fwd_loop(params, x_nhwc, ns[0]))
            compile_s = time.time() - t0
            times = []
            for n in ns:
                _ = float(fwd_loop(params, x_nhwc, n))  # warm this n
                t0 = time.time()
                _ = float(fwd_loop(params, x_nhwc, n))
                times.append((time.time() - t0) * 1e3)
            slope, ovh = fit(times)
            tf = batch * fwd_flops_per_sample / (slope * 1e-3) / 1e12
            results[f"fwd_b{batch}"] = {
                "ns": ns, "total_ms": [round(t, 2) for t in times],
                "ms_per_step": round(slope, 3),
                "ms_per_call_overhead": round(ovh, 2),
                "tf_per_s": round(tf, 1), "compile_s": round(compile_s, 1),
            }
            print(f"[probe] fwd  b={batch}: {slope:.2f} ms/step "
                  f"(+{ovh:.1f} ms/call) -> {tf:.0f} TF/s "
                  f"(compile {compile_s:.0f}s)", flush=True)

        if "step" in args.programs:
            ddpm = UNetDDPM(scheduler=sched, params=params, module=net,
                            parametrization="eps")
            trainer = DDPMTrainer(
                ddpm=ddpm, learning_rate=1e-4, warmup_steps=10,
                total_iters=1000, grad_clip=1.0, ema_decay=0.9999,
            )
            state = trainer.init_state()

            @jax.jit
            def step_loop(st, key, x, n):
                def body(i, carry):
                    s, acc = carry
                    s2, m = trainer.train_step(
                        s, jax.random.fold_in(key, i), x
                    )
                    return (s2, acc + m["loss"])

                s, acc = jax.lax.fori_loop(0, n, body, (st, 0.0))
                return acc

            key = jax.random.PRNGKey(0)
            t0 = time.time()
            _ = float(step_loop(state, key, x_nchw, ns[0]))
            compile_s = time.time() - t0
            times = []
            for n in ns:
                _ = float(step_loop(state, key, x_nchw, n))
                t0 = time.time()
                _ = float(step_loop(state, key, x_nchw, n))
                times.append((time.time() - t0) * 1e3)
            slope, ovh = fit(times)
            step_flops = 3 * batch * fwd_flops_per_sample
            tf = step_flops / (slope * 1e-3) / 1e12
            mfu = tf / 184.0
            results[f"step_b{batch}"] = {
                "ns": ns, "total_ms": [round(t, 2) for t in times],
                "ms_per_step": round(slope, 3),
                "ms_per_call_overhead": round(ovh, 2),
                "tf_per_s": round(tf, 1), "mfu_vs_184": round(mfu, 3),
                "compile_s": round(compile_s, 1),
            }
            print(f"[probe] step b={batch}: {slope:.2f} ms/step "
                  f"(+{ovh:.1f} ms/call) -> {tf:.0f} TF/s "
                  f"mfu={mfu:.3f} (compile {compile_s:.0f}s)", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "overhead_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon teardown hangs


if __name__ == "__main__":
    main()
