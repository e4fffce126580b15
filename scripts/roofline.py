"""Roofline microbenchmark: what matmul/conv rate does THIS chip actually
deliver through this runtime?

Motivation (VERDICT r2, weak #1): bench.py pins ``device_peak_flops`` from a
single 8192^3 bf16 matmul (~108 TF/s) while the v5e spec sheet says 197 TF/s
bf16. This script sweeps shapes (2k-16k, square and skinny), dtypes
(bf16 / f32-HIGHEST / f32-default), chain interleave width, and flagship
conv shapes, printing a table + one JSON line with the best observed rate.
If any configuration beats the pinned number, bench.py's denominator is
wrong and there is real headroom being declared away.

Timing methodology (axon tunnel, see .claude/skills/verify): per-call
timing through the tunnel lies, so each measurement runs ``reps`` chained
ops inside ONE jit (serialized via a scalar data dependency that forces the
full product to be computed — a plain slice could let XLA narrow the dot)
and forces a scalar readback before/after the clock.

Usage:  python scripts/roofline.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


SPEC_BF16_TFLOPS = 197.0  # TPU v5e spec sheet, bf16


def time_matmul(jax, m, n, k, in_dtype, precision, reps, chains=1):
    """TF/s for an (m,k)@(k,n) matmul, ``reps`` serialized inside one jit.

    ``chains`` > 1 runs that many independent serialized chains interleaved
    (exposes whether a single dependency chain leaves pipeline bubbles).
    """
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a0 = jnp.asarray(rng.standard_normal((chains, m, k)), in_dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), in_dtype)

    @jax.jit
    def loop(a, b):
        def body(i, a):
            c = jnp.matmul(
                a, b, precision=precision, preferred_element_type=jnp.float32
            )
            # jnp.sum(c) consumes every element, so the dot cannot be
            # narrowed; feeding the scalar back serializes iterations
            s = jnp.sum(c, axis=(-2, -1), keepdims=True) * 0.0
            return a + s.astype(a.dtype)

        a = jax.lax.fori_loop(0, reps, body, a)
        return jnp.sum(a[..., 0, 0])

    out = loop(a0, b)
    _ = float(out)  # warm-up / compile; scalar fetch beats block_until_ready
    t0 = time.time()
    out = loop(a0, b)
    _ = float(out)
    dt = time.time() - t0
    flops = 2.0 * m * n * k * reps * chains
    return flops / dt / 1e12, dt


def time_conv(jax, batch, hw, cin, cout, ksize, in_dtype, reps):
    """TF/s for an NHWC conv (SAME padding), serialized inside one jit."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.standard_normal((batch, hw, hw, cin)), in_dtype)
    w = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * 0.02, in_dtype
    )
    dn = jax.lax.conv_dimension_numbers(
        x0.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )

    @jax.jit
    def loop(x, w):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            # sum consumes every output element; feeding the (zeroed)
            # scalar back serializes iterations without changing x.
            # (XLA's simplifier preserves float NaN semantics, so s*0 is
            # not folded away — same trick bench.py's sweep loop uses.)
            s = jnp.sum(y, axis=(1, 2, 3), keepdims=True) * 0.0
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(x[0, 0, 0, :])

    out = loop(x0, w)
    _ = float(out)
    t0 = time.time()
    out = loop(x0, w)
    _ = float(out)
    dt = time.time() - t0
    flops = 2.0 * batch * hw * hw * cin * cout * ksize * ksize * reps
    return flops / dt / 1e12, dt


def time_conv_vjp(jax, batch, hw, cin, cout, ksize, in_dtype, reps):
    """TF/s for the full conv VJP (forward + grad-input + grad-filter),
    counted as 3x forward FLOPs — measures whether XLA's two backward
    conv lowerings (input grad = conv with spatially-reversed filters;
    filter grad = a large contraction over batch*space) reach the same
    MXU regime as the forward. Chained in one jit, parameter-update
    feedback serializes iterations.
    """
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.standard_normal((batch, hw, hw, cin)), in_dtype)
    w0 = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * 0.02, in_dtype
    )
    dn = jax.lax.conv_dimension_numbers(
        x0.shape, w0.shape, ("NHWC", "HWIO", "NHWC")
    )

    def loss(x, w):
        # no preferred_element_type here: its fp32 cotangent would hit the
        # bf16 filter in the transpose conv (mixed-dtype error). Cast the
        # output instead so fwd AND both bwd convs run pure bf16.
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
        ).astype(jnp.float32)
        return jnp.sum(y * y)

    @jax.jit
    def loop(x, w):
        def body(i, carry):
            x, w = carry
            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            # tiny feedback into BOTH primals keeps every grad live and
            # serializes iterations without drifting the magnitudes
            return (x + (1e-12 * gx).astype(x.dtype),
                    w + (1e-12 * gw).astype(w.dtype))

        x, w = jax.lax.fori_loop(0, reps, body, (x, w))
        return jnp.sum(w[0, 0, 0, :])

    _ = float(loop(x0, w0))
    t0 = time.time()
    _ = float(loop(x0, w0))
    dt = time.time() - t0
    flops = 3.0 * 2.0 * batch * hw * hw * cin * cout * ksize * ksize * reps
    return flops / dt / 1e12, dt


def time_bandwidth(jax, n_elems, dtype, reps):
    """GB/s for a STREAM-triad-like update ``x = x + alpha * y``:
    2 array reads + 1 array write per rep, serialized by the x->x
    dependency. Round 2 quoted "HBM ~220 GB/s" from per-call timing —
    the same methodology that produced the bogus 108 TF/s matmul peak —
    so this is the honest (chained-in-one-jit) replacement.
    """
    import jax.numpy as jnp

    x0 = jnp.ones((n_elems,), dtype)
    y = jnp.full((n_elems,), 1e-6, dtype)

    @jax.jit
    def loop(x, y):
        def body(i, x):
            # alpha varies with i so XLA cannot strength-reduce the loop
            # to x + reps*alpha*y
            return x + (1e-6 * (1.0 + i)).astype(x.dtype) * y

        x = jax.lax.fori_loop(0, reps, body, x)
        return x[0]

    _ = float(loop(x0, y))
    t0 = time.time()
    _ = float(loop(x0, y))
    dt = time.time() - t0
    gbytes = 3.0 * n_elems * jnp.dtype(dtype).itemsize * reps / 1e9
    return gbytes / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sweep only")
    args = ap.parse_args()

    jax = _setup_jax()
    import jax.numpy as jnp
    from jax.lax import Precision

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    rows = []

    def record(kind, desc, tf, dt):
        rows.append((kind, desc, tf, dt))
        print(f"{kind:8s} {desc:52s} {tf:8.1f} TF/s  ({dt:.2f}s)", flush=True)

    # ---- matmul shape sweep, bf16 ----
    sizes = [2048, 4096, 8192] if args.quick else [2048, 4096, 8192, 12288, 16384]
    for s in sizes:
        # target ~1.5s per timed call at 100 TF/s
        reps = max(4, int(1.5 * 100e12 / (2.0 * s**3)))
        tf, dt = time_matmul(jax, s, s, s, jnp.bfloat16, Precision.DEFAULT, reps)
        record("matmul", f"bf16 {s}x{s}x{s} reps={reps}", tf, dt)

    # ---- skinny / rectangular (UNet-like) shapes, bf16 ----
    rect = [
        (262144, 256, 256),   # 32x32x256 batch-256 activations @ 1x1-conv-like
        (65536, 512, 512),
        (8192, 8192, 512),
        (8192, 512, 8192),
        (512, 8192, 8192),
    ]
    if not args.quick:
        for (m, n, k) in rect:
            reps = max(4, int(1.0 * 100e12 / (2.0 * m * n * k)))
            tf, dt = time_matmul(
                jax, m, n, k, jnp.bfloat16, Precision.DEFAULT, reps
            )
            record("matmul", f"bf16 {m}x{n}x{k} reps={reps}", tf, dt)

    # ---- interleaved chains: does one dependency chain leave bubbles? ----
    for chains in ([2] if args.quick else [2, 4]):
        s = 8192
        reps = max(4, int(1.5 * 100e12 / (2.0 * s**3 * chains)))
        tf, dt = time_matmul(
            jax, s, s, s, jnp.bfloat16, Precision.DEFAULT, reps, chains=chains
        )
        record("matmul", f"bf16 {s}^3 chains={chains} reps={reps}", tf, dt)

    # ---- dtype/precision modes at the best square size ----
    s = 8192
    reps = max(4, int(1.0 * 100e12 / (2.0 * s**3)))
    for desc, dtype, prec in [
        ("f32-default(bf16_3x)", jnp.float32, Precision.DEFAULT),
        ("f32-HIGHEST", jnp.float32, Precision.HIGHEST),
    ]:
        tf, dt = time_matmul(jax, s, s, s, dtype, prec, max(2, reps // 4))
        record("matmul", f"{desc} {s}^3", tf, dt)

    # ---- flagship conv shapes (UNet 3x3 convs, NHWC, bf16) ----
    # b256 = train batch; b64 = the measured-optimal sampler batch
    convs = [
        (256, 32, 128, 128, 3),
        (256, 32, 256, 256, 3),
        (256, 16, 256, 256, 3),
        (256, 8, 256, 256, 3),
        (64, 32, 128, 128, 3),
        (64, 16, 256, 256, 3),
        (64, 8, 256, 256, 3),
    ]
    for (b, hw, cin, cout, ks) in convs if not args.quick else convs[:2]:
        fl = 2.0 * b * hw * hw * cin * cout * ks * ks
        reps = max(4, int(1.0 * 100e12 / fl))
        tf, dt = time_conv(jax, b, hw, cin, cout, ks, jnp.bfloat16, reps)
        record("conv", f"bf16 b{b} {hw}x{hw} {cin}->{cout} k{ks} reps={reps}", tf, dt)

    # ---- conv VJP (fwd + both backward convs, 3x fwd FLOPs) ----
    vjp_convs = [
        (128, 16, 256, 256, 3),
        (128, 8, 256, 256, 3),
        (256, 16, 256, 256, 3),
    ]
    for (b, hw, cin, cout, ks) in vjp_convs if not args.quick else vjp_convs[:1]:
        fl = 3.0 * 2.0 * b * hw * hw * cin * cout * ks * ks
        reps = max(4, int(0.5 * 800e12 / fl))
        tf, dt = time_conv_vjp(jax, b, hw, cin, cout, ks, jnp.bfloat16, reps)
        record(
            "convVJP", f"bf16 b{b} {hw}x{hw} {cin}->{cout} k{ks} reps={reps}",
            tf, dt,
        )

    # ---- HBM bandwidth (STREAM triad, serialized in one jit) ----
    # rows whose working set fits in the 128 MiB VMEM measure on-chip
    # bandwidth, not HBM — keep the two pools separate in the summary
    hbm_rows, vmem_rows = [], []
    for n_elems, dtype, tag in [
        (1 << 27, jnp.float32, "f32 512MiB-arrays"),
        (1 << 27, jnp.bfloat16, "bf16 256MiB-arrays"),
        (1 << 22, jnp.float32, "f32 16MiB-arrays"),
    ] if not args.quick else [(1 << 26, jnp.float32, "f32 256MiB-arrays")]:
        nbytes = 3.0 * n_elems * jnp.dtype(dtype).itemsize
        reps = max(8, int(1.0 * 800e9 / nbytes))
        gbs, dt = time_bandwidth(jax, n_elems, dtype, reps)
        (vmem_rows if nbytes <= 128 * 2**20 else hbm_rows).append(gbs)
        pool = "vmem-resident" if nbytes <= 128 * 2**20 else "HBM"
        print(
            f"triad    {tag:38s} {pool:13s} {gbs:8.1f} GB/s  ({dt:.2f}s)",
            flush=True,
        )

    best = max(rows, key=lambda r: r[2])
    # pure-bf16 rows only: "f32-default(bf16_3x)" also contains the
    # substring "bf16" but is an fp32 measurement
    best_bf16 = max(
        (r for r in rows if r[1].startswith("bf16")), key=lambda r: r[2]
    )
    print(
        json.dumps({
            "best_tflops": round(best[2], 1),
            "best_config": f"{best[0]} {best[1]}",
            "best_bf16_tflops": round(best_bf16[2], 1),
            "spec_bf16_tflops": SPEC_BF16_TFLOPS,
            "fraction_of_spec": round(best_bf16[2] / SPEC_BF16_TFLOPS, 3),
            "hbm_triad_gbs": round(max(hbm_rows), 1) if hbm_rows else None,
            "vmem_triad_gbs": round(max(vmem_rows), 1) if vmem_rows else None,
            "device": dev.device_kind,
        })
    )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
