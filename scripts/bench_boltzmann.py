"""Benchmark the Boltzmann moments op: Pallas kernel vs the XLA scan path.

Measures the flagship stats shape (B=1024, N=50k, D=3072) plus variants,
with repetitions folded inside one jit (lax.fori_loop) so the ~30 ms
axon dispatch overhead doesn't pollute kernel timings; a host fetch
forces completion (block_until_ready is a no-op on this backend).
"""
import argparse
import time

from _common import setup_jax


def bench_case(B, N, D, reps, impl, mxu_precision="bf16_3x", compute_mean=False):
    import jax
    import jax.numpy as jnp

    from pdm_tpu.ops.boltzmann import boltzmann_moments_xla
    from pdm_tpu.ops.boltzmann_pallas import boltzmann_moments_pallas

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.float32)
    inv_temp = jnp.full((B,), 0.7, jnp.float32)

    if impl == "pallas":
        def one(xi, yi):
            return boltzmann_moments_pallas(
                xi, yi, inv_temp, compute_mean=compute_mean,
                mxu_precision=mxu_precision,
            )
    else:
        def one(xi, yi):
            return boltzmann_moments_xla(
                xi, yi, inv_temp, compute_mean=compute_mean
            )

    # y must be a jit ARGUMENT: closed-over arrays become HLO constants and
    # a 600 MB literal blows the remote-compile payload limit
    @jax.jit
    def loop(x0, yi):
        def body(i, carry):
            mom = one(carry, yi)
            # serialize iterations through a data dependency
            return carry + 0.0 * mom.log_z[:, None]

        return jax.lax.fori_loop(0, reps, body, x0)

    out = loop(x, y)  # compile + warm
    float(out[0, 0])
    t0 = time.perf_counter()
    out = loop(x, y)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    pairs = B * N / dt
    eff_tflops = 2 * B * N * D / dt / 1e12
    return dt, pairs, eff_tflops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=1024)
    p.add_argument("--N", type=int, default=50_000)
    p.add_argument("--D", type=int, default=3072)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--mean", action="store_true")
    p.add_argument(
        "--impls", default="xla,pallas,pallas_bf16",
        help="comma list: xla, pallas, pallas_bf16, pallas_fp32",
    )
    args = p.parse_args()
    setup_jax()

    for impl in args.impls.split(","):
        kind, prec = (
            ("pallas", "bf16_3x") if impl == "pallas" else
            ("pallas", "bf16") if impl == "pallas_bf16" else
            ("pallas", "fp32") if impl == "pallas_fp32" else
            ("xla", None)
        )
        dt, pairs, tf = bench_case(
            args.B, args.N, args.D, args.reps, kind,
            mxu_precision=prec or "bf16_3x", compute_mean=args.mean,
        )
        print(
            f"{impl:12s} B={args.B} N={args.N} D={args.D} mean={args.mean}: "
            f"{dt * 1e3:8.3f} ms  {pairs:.3e} pairs/s  {tf:6.2f} eff-TF/s"
        )


if __name__ == "__main__":
    import os

    main()
    os._exit(0)  # axon teardown lingers
