"""Headline benchmark: CIFAR-10-shaped 1000-step ancestral DDPM sampling
throughput on the flagship UNet (bf16 compute), per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no speed numbers (BASELINE.md) — vs_baseline is
the ratio against the previous recorded round (BENCH_r*.json) when one
exists, else 1.0.

Secondary numbers (stats-MC pairs/sec) go to stderr.
"""

import glob
import json
import os
import sys
import time


def main():
    import jax

    # persistent XLA compilation cache: the 1000-step sampler graph is big;
    # warm runs skip the several-minute compile entirely
    cache_dir = os.path.join(os.path.dirname(__file__) or ".", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.models.unet_ddpm import UNetDDPM
    from __graft_entry__ import _flagship, _zeros_params

    net, sched, size = _flagship()  # bf16 CIFAR-10 config
    params = _zeros_params(net, size)
    # non-degenerate weights for honest timing (cheap host-side fill)
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda z: jnp.asarray(
            rng.standard_normal(z.shape).astype(np.float32) * 0.02, z.dtype
        ),
        params,
    )
    ddpm = UNetDDPM(scheduler=sched, params=params, module=net,
                    parametrization="eps")

    n_steps = 1000
    batch = 256
    sampler = DDPMSampler(
        ddpm=ddpm, scheduler=sched, n_steps=n_steps, obj_size=(3, size, size),
        batch_size=batch, n_samples=batch, step_type="ddpm", precision="half",
    )

    # compile
    t0 = time.time()
    out = sampler.batch_sample(jax.random.PRNGKey(0))
    jax.block_until_ready(out["x"])
    compile_s = time.time() - t0

    # timed runs
    reps = 2
    t0 = time.time()
    for i in range(reps):
        out = sampler.batch_sample(jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out["x"])
    dt = (time.time() - t0) / reps
    samples_per_sec = batch / dt

    # secondary: stats-MC pairs/sec (streaming Boltzmann op, CIFAR dims)
    from pdm_tpu.ops.boltzmann import boltzmann_moments

    data = jnp.asarray(rng.standard_normal((50_000, 3072)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1024, 3072)).astype(np.float32))
    mom = boltzmann_moments(x, data, inv_temp=1.0)  # compile
    _ = float(mom.log_z[0])  # axon: block_until_ready is unreliable; force a fetch
    t0 = time.time()
    for i in range(3):
        mom = boltzmann_moments(x, data, inv_temp=1.0 + i)
        _ = float(mom.log_z[0])
    pairs_per_sec = 3 * 1024 * 50_000 / (time.time() - t0)
    print(
        f"[bench] compile={compile_s:.1f}s sample_batch={dt:.2f}s "
        f"stats_pairs/s={pairs_per_sec:.3e} (D=3072)",
        file=sys.stderr,
    )

    prev = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")))
    vs = 1.0
    if prev:
        try:
            with open(prev[-1]) as f:
                last = json.load(f)
            if last.get("value"):
                vs = samples_per_sec / float(last["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": "cifar10_unet_ddpm1000_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
    # the axon backend's client teardown can hang after results are
    # printed; exit hard so the driver never stalls on us
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
