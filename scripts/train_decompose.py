"""In-step phase decomposition of the flagship train step (VERDICT r3 #1).

Where do the train step's milliseconds go? The round-3 roofline proved the
convs themselves run at 148-190 TF/s in isolation (forward AND backward),
yet the full step measures ~0.50 MFU. This script attributes the gap by
timing ablated variants of the SAME donated step — each as ``reps`` chained
iterations inside ONE jit with a scalar readback (per-call timing through
the axon tunnel lies; see .claude/skills/verify/SKILL.md).

Variants:
  fwd_eval     loss only, dropout off (deterministic forward)
  fwd_train    loss only, dropout on (isolates mask gen + apply)
  grads        value_and_grad, grads consumed by global_norm (no optimizer)
  opt_only     clip + Adam + EMA applied to fixed grads (no network)
  full         the production train step (fwd+bwd+clip+Adam+EMA)
  full_nodrop  production step with dropout=0.0 (bwd dropout share)
  accum2/4     production step with grad_accum=2/4 (micro-batch VMEM
               residency: does bs=64 forward speed survive the scan?)

Derived attribution (committed to TRAIN_ROOFLINE.md):
  backward    = grads - fwd_train
  dropout     = full - full_nodrop
  optimizer   = full - grads            (cross-check vs opt_only)
  conv floor  = conv FLOPs / 184 TF/s   (measured device peak)

Run: python scripts/train_decompose.py [--batch 128] [--reps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip", default="", help="comma-list of variants to skip")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship, _zeros_params
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet_ddpm import UNetDDPM

    net, sched, size = _flagship()
    params = _zeros_params(net, size)
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda z: jnp.asarray(
            rng.standard_normal(z.shape).astype(np.float32) * 0.02, z.dtype
        ),
        params,
    )
    batch = args.batch
    reps = args.reps
    x0 = jnp.asarray(
        rng.standard_normal((batch, 3, size, size)).astype(np.float32)
    )

    def make_trainer(module, grad_accum=1, data_layout="nchw"):
        ddpm = UNetDDPM(
            scheduler=sched, params=params, module=module,
            parametrization="eps",
        )
        return DDPMTrainer(
            ddpm=ddpm, learning_rate=1e-4, warmup_steps=10, total_iters=1000,
            grad_clip=1.0, ema_decay=0.9999, grad_accum=grad_accum,
            data_layout=data_layout,
        )

    trainer = make_trainer(net)
    state = trainer.init_state()
    results = {}

    def timed(name, fn, *fn_args):
        """fn(*fn_args) -> scalar; compile once, time once, ms per rep."""
        if name in skip:
            return
        t0 = time.time()
        out = fn(*fn_args)
        _ = float(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn(*fn_args)
        _ = float(out)
        ms = (time.time() - t0) / reps * 1e3
        results[name] = ms
        print(f"[decompose] {name:12s} {ms:8.2f} ms/step "
              f"(compile {compile_s:.0f}s)", file=sys.stderr)

    # ---- loss-only forwards ----------------------------------------
    def fwd_loop(deterministic):
        def f(p, key, x):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                if deterministic:
                    # same noise draw, no dropout rngs. The noise key goes
                    # through the SAME generator the trainer's loss_fn
                    # uses (noise_rng_impl, rbg by default) so
                    # fwd_train - fwd_eval isolates dropout alone, not
                    # dropout + a threefry-vs-rbg noise-draw delta
                    # (ADVICE r4).
                    from pdm_tpu.core.temperature import (
                        alpha_bar_from_log_temp,
                    )
                    from pdm_tpu.diffusion.trainer import _dropout_key
                    from pdm_tpu.models.predictions import training_target

                    kn, _ = jax.random.split(k)
                    kn = _dropout_key(kn, trainer.noise_rng_impl)
                    # mirror the (round-5, NHWC-native) production loss_fn:
                    # one up-front x0 transpose, everything downstream NHWC
                    xh0 = jnp.transpose(x, (0, 2, 3, 1))
                    tau, eps, xt = sched.add_noise(kn, xh0)
                    ab = alpha_bar_from_log_temp(sched.log_temp_from_tau(tau))
                    pred = net.apply({"params": p}, xt, tau, deterministic=True)
                    tgt = training_target(xh0, eps, ab, "eps")
                    l = jnp.mean(jnp.square(pred - tgt.astype(pred.dtype)))
                else:
                    l, _ = trainer.loss_fn(p, k, x)
                return acc + l

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return jax.jit(f)

    timed("fwd_eval", fwd_loop(True), params, jax.random.PRNGKey(1), x0)
    timed("fwd_train", fwd_loop(False), params, jax.random.PRNGKey(1), x0)

    # ---- pure network forward (no loss wrapper) ----------------------
    # Output feeds the next iteration's input — a REAL data dependency,
    # so XLA cannot dead-code any of the network (unlike a `0.0 * out`
    # consumer, which the algebraic simplifier may fold away).
    @jax.jit
    def net_loop(p, x):
        tau_c = jnp.full((x.shape[0],), 0.5, jnp.float32)

        def body(i, xc):
            out = net.apply({"params": p}, xc, tau_c, deterministic=True)
            return out.astype(xc.dtype)

        xr = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(xr[0, 0, 0, :])

    x_nhwc = jnp.transpose(x0, (0, 2, 3, 1))
    timed("fwd_net", net_loop, params, x_nhwc)

    # ---- grads only (no optimizer) ----------------------------------
    @jax.jit
    def grads_loop(p, key, x):
        def body(i, acc):
            (l, _), g = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
                p, jax.random.fold_in(key, i), x
            )
            import optax

            return acc + l + optax.global_norm(g)

        return jax.lax.fori_loop(0, reps, body, 0.0)

    timed("grads", grads_loop, params, jax.random.PRNGKey(1), x0)

    # ---- optimizer/EMA only ------------------------------------------
    fixed_grads = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, jnp.float32), params
    )

    @jax.jit
    def opt_loop(st, g):
        import optax

        def body(i, s):
            up, opt_state = trainer.optimizer.update(g, s.opt_state, s.params)
            newp = optax.apply_updates(s.params, up)
            ema = optax.incremental_update(newp, s.ema_params, 1e-4)
            return dataclasses.replace(
                s, params=newp, ema_params=ema, opt_state=opt_state,
                step=s.step + 1,
            )

        s = jax.lax.fori_loop(0, reps, body, st)
        return s.params["conv_in"]["bias"][0]

    timed("opt_only", opt_loop, state, fixed_grads)

    # ---- full production steps ---------------------------------------
    def full_loop(tr, compiler_options=None):
        def f(st, key, x):
            def body(i, carry):
                s, acc = carry
                s2, m = tr.train_step(s, jax.random.fold_in(key, i), x)
                return (s2, acc + m["loss"])

            _, acc = jax.lax.fori_loop(0, reps, body, (st, 0.0))
            return acc

        # the trainer's inner jit inlines under this outer trace, so the
        # options must land on the OUTER jit to reach the XLA compile
        return jax.jit(f, compiler_options=compiler_options)

    timed("full", full_loop(trainer), state, jax.random.PRNGKey(1), x0)

    # NHWC-resident dataset: the production data_layout="nhwc" config —
    # same step minus the per-step gradient-free x0 transpose
    if "full_nhwc" not in skip:
        timed(
            "full_nhwc",
            full_loop(make_trainer(net, data_layout="nhwc")),
            state, jax.random.PRNGKey(1),
            jnp.transpose(x0, (0, 2, 3, 1)),
        )

    nodrop = dataclasses.replace(net, dropout=0.0)
    timed("full_nodrop", full_loop(make_trainer(nodrop)), state,
          jax.random.PRNGKey(1), x0)

    for a in (2, 4):
        timed(f"accum{a}", full_loop(make_trainer(net, grad_accum=a)),
              state, jax.random.PRNGKey(1), x0)

    # ---- XLA exec-effort compiler options on the production step ------
    for label, opts in (
        # 2x the default scoped-VMEM budget: lets XLA fuse bigger
        # producer chains into the conv epilogues before spilling
        ("full_vmem", (("xla_tpu_scoped_vmem_limit_kib", 131072),)),
        ("full_lhs", (("xla_tpu_enable_latency_hiding_scheduler", True),)),
    ):
        if label in skip:
            continue
        try:
            timed(label, full_loop(make_trainer(net), dict(opts)),
                  state, jax.random.PRNGKey(1), x0)
        except Exception as e:  # flag not recognized by this XLA build
            print(f"[decompose] {label} failed: {e}", file=sys.stderr)

    # ---- FLOPs + floors ----------------------------------------------
    step_flops = None
    try:
        ca = jax.jit(trainer.train_step).lower(
            state, jax.random.PRNGKey(0), x0
        ).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        step_flops = float(ca["flops"])
    except Exception as e:  # pragma: no cover
        print(f"[decompose] cost_analysis failed: {e}", file=sys.stderr)

    peak = 184e12
    out = {"batch": batch, "reps": reps, "ms": results}
    if step_flops:
        out["step_flops"] = step_flops
        out["ideal_ms_at_peak"] = step_flops / peak * 1e3
        if "full" in results:
            out["full_mfu"] = step_flops / (results["full"] * 1e-3) / peak
    d = {}
    if {"grads", "fwd_train"} <= results.keys():
        d["backward_ms"] = results["grads"] - results["fwd_train"]
    if {"full", "full_nodrop"} <= results.keys():
        d["dropout_ms"] = results["full"] - results["full_nodrop"]
    if {"full", "grads"} <= results.keys():
        d["optimizer_ms"] = results["full"] - results["grads"]
    if {"fwd_train", "fwd_eval"} <= results.keys():
        d["dropout_fwd_ms"] = results["fwd_train"] - results["fwd_eval"]
    out["derived"] = d
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
