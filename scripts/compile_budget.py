"""Where does the 1000-step sampler's cold compile go, and can XLA effort
flags cut it without costing throughput? (VERDICT r3 #3)

Phases measured separately on the exact bench.py program:
  trace+lower   jax tracing -> StableHLO (Python side)
  compile       XLA backend compile of the lowered module
  run           steady-state per-batch sampling seconds

Each row re-runs compile with a different `compiler_options` dict (an
empty dict = production default). The persistent cache is DISABLED here
(we are measuring cold cost; bench.py keeps the cache on).

Run: python scripts/compile_budget.py [--steps 1000] [--batch 64]
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
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--opts", default="default,effort_low",
                    help="comma list: default|effort_low|effort_min")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship, _zeros_params
    from pdm_tpu.diffusion.sampling import DDPMSampler, _sample_scan
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
    ddpm = UNetDDPM(scheduler=sched, params=params, module=net,
                    parametrization="eps")
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=args.steps,
        obj_size=(3, size, size), batch_size=args.batch,
        n_samples=args.batch, step_type="ddpm", precision="half",
    )
    grid = sampler._grid()
    key = jax.random.PRNGKey(0)
    shape = (args.batch, 3, size, size)

    option_sets = {
        "default": {},
        # lower XLA's exec-time optimization effort: fewer/faster passes
        "effort_low": {"xla_exec_time_optimization_effort": -0.5},
        "effort_min": {"xla_exec_time_optimization_effort": -1.0},
        # the latency-hiding scheduler is a known compile-time hog on big
        # while-bodies; measure what turning it off costs/saves
        "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": False},
        # pseudo-option: XLA-einsum attention instead of the grouped-head
        # Pallas kernel (PDM_FUSED_ATTN=0) — isolates the Mosaic kernel's
        # share of the cold compile (the r3->r4 bisect suspect, commit
        # 7cacd2a)
        "no_fused_attn": {},
    }

    results = {}
    for name in args.opts.split(","):
        opts = option_sets[name]
        if name == "no_fused_attn":
            os.environ["PDM_FUSED_ATTN"] = "0"
        t0 = time.time()
        lowered = _sample_scan.lower(
            ddpm, grid, key, shape, "ddpm", True, False, None
        )
        t_lower = time.time() - t0
        if name == "no_fused_attn":
            os.environ.pop("PDM_FUSED_ATTN", None)
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(f"[compile_budget] {name}: compile failed: {e}",
                  file=sys.stderr, flush=True)
            continue
        t_compile = time.time() - t0
        # steady state: 2 timed runs (AOT call: static args are baked in)
        out, _ = compiled(ddpm, grid, key)
        _ = float(jnp.sum(out))
        t0 = time.time()
        for i in range(2):
            out, _ = compiled(ddpm, grid, jax.random.PRNGKey(i + 1))
        _ = float(jnp.sum(out))
        t_run = (time.time() - t0) / 2
        results[name] = {
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "run_s": round(t_run, 2),
            "samples_per_sec": round(args.batch / t_run, 2),
        }
        print(f"[compile_budget] {name:12s} lower={t_lower:.1f}s "
              f"compile={t_compile:.1f}s run={t_run:.2f}s", file=sys.stderr,
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
