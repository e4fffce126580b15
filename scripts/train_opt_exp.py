"""Candidate train-step optimizations, timed against the production step.

Motivated by the round-4 decomposition: the flagship train step (bs=128)
spends ~55% of its time at conv-floor FLOPs and the rest between convs.
The sampler showed bs=64 forwards run ~1.2x faster per image (VMEM
residency of the 16x16-level activations, ROOFLINE.md conclusion 6), so
the leading candidate is running the SAME global-batch-128 step as two
sequential micro-batch-64 grad passes (identical optimizer math — the
trainer's grad_accum path) with the accumulation scan unrolled.

Variants (each: ``reps`` chained steps inside ONE jit, scalar readback):
  full        production step, bs=128 (baseline)
  accum2      production grad_accum=2 (scan carry)
  accum2u     grad_accum=2 with the 2-step scan UNROLLED (g = g1 + g2
              fused into the second backward's epilogue)
  accum4u     grad_accum=4 unrolled
  flatopt     optax.flatten around the optimizer chain (one fused
              elementwise loop over a single flat buffer instead of ~280
              per-leaf loops) + flattened EMA

Run: python scripts/train_opt_exp.py [--batch 128] [--reps 10] [--skip a,b]
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
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship, _zeros_params
    from pdm_tpu.diffusion.trainer import DDPMTrainer, TrainState
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
    batch, reps = args.batch, args.reps
    x0 = jnp.asarray(
        rng.standard_normal((batch, 3, size, size)).astype(np.float32)
    )

    def make_trainer(grad_accum=1, accum_unroll=False):
        ddpm = UNetDDPM(
            scheduler=sched, params=params, module=net, parametrization="eps"
        )
        return DDPMTrainer(
            ddpm=ddpm, learning_rate=1e-4, warmup_steps=10, total_iters=1000,
            grad_clip=1.0, ema_decay=0.9999, grad_accum=grad_accum,
            accum_unroll=accum_unroll,
        )

    results = {}

    def timed(name, fn, *fn_args):
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
        print(f"[opt_exp] {name:10s} {ms:8.2f} ms/step "
              f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)

    def full_loop(tr):
        state = tr.init_state()

        def f(st, key, x):
            def body(i, carry):
                s, acc = carry
                s2, m = tr.train_step(s, jax.random.fold_in(key, i), x)
                return (s2, acc + m["loss"])

            _, acc = jax.lax.fori_loop(0, reps, body, (st, 0.0))
            return acc

        return jax.jit(f), state

    for name, kw in [
        ("full", {}),
        ("accum2u", dict(grad_accum=2, accum_unroll=True)),
        ("accum2", dict(grad_accum=2)),
        ("accum4u", dict(grad_accum=4, accum_unroll=True)),
    ]:
        if name in skip:
            continue
        fn, state = full_loop(make_trainer(**kw))
        timed(name, fn, state, jax.random.PRNGKey(1), x0)

    # ---- flatopt: flatten params for the optimizer + EMA ----------------
    if "flatopt" not in skip:
        base = make_trainer()
        opt = optax.flatten(base.optimizer)

        def flat_step(state, key, x):
            (loss, _), grads = jax.value_and_grad(
                base.loss_fn, has_aux=True
            )(state.params, key, x)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            new_p = optax.apply_updates(state.params, updates)
            ema = optax.incremental_update(new_p, state.ema_params, 1e-4)
            return TrainState(
                step=state.step + 1, params=new_p, ema_params=ema,
                opt_state=opt_state,
            ), loss

        fstate = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.copy, params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=opt.init(params),
        )

        @jax.jit
        def flat_loop(st, key, x):
            def body(i, carry):
                s, acc = carry
                s2, l = flat_step(s, jax.random.fold_in(key, i), x)
                return (s2, acc + l)

            _, acc = jax.lax.fori_loop(0, reps, body, (st, 0.0))
            return acc

        timed("flatopt", flat_loop, fstate, jax.random.PRNGKey(1), x0)

    print(json.dumps({"batch": batch, "reps": reps, "ms": results}))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
