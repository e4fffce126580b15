"""Hardware verification of the whole-attention-block fused kernel
(ops/attention_block.py) — VERDICT r4 weak #3: "built, not proven".

Three stages, all on the real chip:

1. PARITY (compiled, not interpret): fused_attention_block forward and
   full VJP vs the XLA composite (qkv GEMM -> fp32 softmax attention ->
   out Dense -> residual) at the flagship geometry (T=256, C=256,
   heads=4, bf16 compute).
2. BLOCK TIMING: K-chained fwd and value_and_grad of the isolated block,
   fused vs XLA (one jit, scalar readback — per-call timing through the
   axon tunnel lies).
3. STEP TIMING: the production flagship train step with PDM_FUSED_BLOCK=1
   vs the default path, same K-chained protocol as train_decompose.py.

The verdict (faster / slower / parity-fail) decides whether the kernel
flips default-on (use_fused_attention_block) or stays opt-in with the
negative result recorded in TRAIN_ROOFLINE.md.

Run: python scripts/verify_attention_block.py [--batch 128] [--reps 10]
Writes scripts/verify_attention_block.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip-step", action="store_true",
                    help="kernel parity + block timing only")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from pdm_tpu.ops.attention_block import fused_attention_block

    B, T, C, heads = args.batch, 256, 256, 4
    hd = C // heads
    scale = 1.0 / float(np.sqrt(hd))
    rng = np.random.RandomState(0)

    def mk(shape, s=0.5):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    x = mk((B, T, C)).astype(jnp.bfloat16)
    h = mk((B, T, C)).astype(jnp.bfloat16)
    w_qkv = mk((C, 3 * C), 0.06).astype(jnp.bfloat16)
    b_qkv = mk((3 * C,), 0.02)
    w_out = mk((C, C), 0.06).astype(jnp.bfloat16)
    b_out = mk((C,), 0.02)

    def xla_block(x, h, w_qkv, b_qkv, w_out, b_out):
        qkv = jnp.dot(h, w_qkv) + b_qkv.astype(h.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(h.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
        att = att.transpose(0, 2, 1, 3).reshape(B, T, C)
        out = jnp.dot(att, w_out) + b_out.astype(h.dtype)
        return x + out

    def fused_block(x, h, w_qkv, b_qkv, w_out, b_out):
        return fused_attention_block(
            x, h, w_qkv, b_qkv, w_out, b_out, heads, scale
        )

    results = {}

    # ---- 1. parity -----------------------------------------------------
    ref = jax.jit(xla_block)(x, h, w_qkv, b_qkv, w_out, b_out)
    got = jax.jit(fused_block)(x, h, w_qkv, b_qkv, w_out, b_out)
    fwd_err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32)
    )))
    fwd_scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))

    def loss(fn):
        def f(args_):
            out = fn(*args_)
            # nonuniform cotangent exercises every VJP path
            wts = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out.astype(jnp.float32) * jnp.sin(wts * 1e-3))
        return f

    argt = (x, h, w_qkv, b_qkv, w_out, b_out)
    g_ref = jax.jit(jax.grad(loss(xla_block)))(argt)
    g_got = jax.jit(jax.grad(loss(fused_block)))(argt)
    names = ["x", "h", "w_qkv", "b_qkv", "w_out", "b_out"]
    grad_errs = {}
    for n, a, b in zip(names, g_got, g_ref):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(bf).max(), 1e-6)
        grad_errs[n] = float(np.abs(af - bf).max() / denom)
    # bf16 compute: elementwise rel-err of ~1-2% is the dtype floor
    parity_ok = fwd_err / max(fwd_scale, 1e-6) < 0.03 and all(
        v < 0.05 for v in grad_errs.values()
    )
    results["parity"] = {
        "fwd_max_abs_err": fwd_err, "fwd_max_abs": fwd_scale,
        "grad_rel_errs": grad_errs, "ok": bool(parity_ok),
    }
    print(f"[fab] parity: fwd_err={fwd_err:.4f} (scale {fwd_scale:.1f}) "
          f"grads={ {k: round(v, 4) for k, v in grad_errs.items()} } "
          f"ok={parity_ok}", file=sys.stderr, flush=True)

    # ---- 2. isolated block timing -------------------------------------
    def chain(fn, wgrad):
        if wgrad:
            gf = jax.grad(
                lambda xx, rest: jnp.sum(
                    fn(xx, *rest).astype(jnp.float32) ** 2
                )
            )

            def body(i, xc):
                return xc + 1e-6 * gf(xc, (h, w_qkv, b_qkv, w_out, b_out))
        else:
            def body(i, xc):
                return fn(xc, h, w_qkv, b_qkv, w_out, b_out).astype(xc.dtype)

        @jax.jit
        def run(x0):
            xr = jax.lax.fori_loop(0, args.reps, body, x0)
            return jnp.sum(xr[0, 0, :].astype(jnp.float32))

        return run

    for label, fn in (("xla", xla_block), ("fused", fused_block)):
        for wgrad in (False, True):
            tag = f"{label}_{'fwdbwd' if wgrad else 'fwd'}"
            run = chain(fn, wgrad)
            _ = float(run(x))  # compile
            t0 = time.time()
            _ = float(run(x))
            ms = (time.time() - t0) / args.reps * 1e3
            results[tag] = round(ms, 3)
            print(f"[fab] {tag:14s} {ms:7.3f} ms/block-call (B={B})",
                  file=sys.stderr, flush=True)

    # ---- 3. production step timing ------------------------------------
    if not args.skip_step:
        import dataclasses

        from __graft_entry__ import _flagship, _zeros_params
        from pdm_tpu.diffusion.trainer import DDPMTrainer
        from pdm_tpu.models.unet_ddpm import UNetDDPM

        net, sched, size = _flagship()
        params = jax.tree_util.tree_map(
            lambda z: jnp.asarray(
                rng.standard_normal(z.shape).astype(np.float32) * 0.02,
                z.dtype,
            ),
            _zeros_params(net, size),
        )
        x0 = mk((args.batch, 3, size, size), 1.0)

        def step_ms(env_on):
            os.environ["PDM_FUSED_BLOCK"] = "1" if env_on else "0"
            ddpm = UNetDDPM(scheduler=sched, params=params, module=net,
                            parametrization="eps")
            tr = DDPMTrainer(
                ddpm=ddpm, learning_rate=1e-4, warmup_steps=10,
                total_iters=1000, grad_clip=1.0, ema_decay=0.9999,
            )
            st = tr.init_state()

            @jax.jit
            def k_steps(st, key, xx):
                def body(i, carry):
                    s, acc = carry
                    s2, m = tr.train_step(s, jax.random.fold_in(key, i), xx)
                    return (s2, acc + m["loss"])

                _, acc = jax.lax.fori_loop(0, args.reps, body, (st, 0.0))
                return acc

            _ = float(k_steps(st, jax.random.PRNGKey(0), x0))
            t0 = time.time()
            _ = float(k_steps(st, jax.random.PRNGKey(1), x0))
            return (time.time() - t0) / args.reps * 1e3

        ms_off = step_ms(False)
        print(f"[fab] step fused_block=0: {ms_off:.2f} ms", file=sys.stderr,
              flush=True)
        ms_on = step_ms(True)
        print(f"[fab] step fused_block=1: {ms_on:.2f} ms", file=sys.stderr,
              flush=True)
        os.environ.pop("PDM_FUSED_BLOCK", None)
        results["step_ms_default"] = round(ms_off, 2)
        results["step_ms_fused_block"] = round(ms_on, 2)
        results["step_speedup"] = round(ms_off / ms_on, 4)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "verify_attention_block.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
