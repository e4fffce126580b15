"""Quantify the multi-chip story without multi-chip hardware (SCALING.md).

The dryrun (__graft_entry__.dryrun_multichip) proves the sharded programs
COMPILE AND RUN; this script prices them. For each parallelism strategy it
compiles the real train/sample/stats step on an N-device virtual CPU mesh,
extracts every GSPMD-inserted collective from the optimized HLO
(pdm_tpu/parallel/collectives.py), checks the measured bytes against the
closed-form cost model, and projects v5e ICI step overheads for the
flagship (47.6M-param CIFAR UNet) and the 256x256 family (113.7M).

Strategies priced:
  dp        pure data parallelism (batch over 'data'): gradient all-reduce
  dp_tp     DP x channel tensor parallelism: grad reduce + activation
            collectives on the 'model' axis
  fsdp      ZeRO-3: per-layer weight all-gather + gradient reduce-scatter
  sp        spatial parallelism (activation H over 'model'): 3x3 halo
            exchanges as collective-permutes
  stats     dataset-axis-sharded Boltzmann sweep: psum-merged moments

Run:  python scripts/scaling_report.py [--devices 8] [--out SCALING.md]
The n=16/32 shape regressions live in tests/test_scaling.py.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _child(n_devices: int) -> dict:
    """Re-exec under JAX_PLATFORMS=cpu with n virtual devices; returns the
    measurement dict (same bootstrap as __graft_entry__.dryrun_multichip)."""
    env = dict(os.environ)
    env["_PDM_SCALING_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--devices",
         str(n_devices), "--emit-json"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(res.stderr)
    if res.returncode != 0:
        raise RuntimeError(f"scaling child failed rc={res.returncode}")
    return json.loads(res.stdout.splitlines()[-1])


def measure(n_devices: int) -> dict:
    """Compile each strategy on the tiny UNet; extract collective bytes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from pdm_tpu.diffusion.trainer import DDPMTrainer
    from pdm_tpu.models.unet_ddpm import UNetDDPM
    from pdm_tpu.parallel.collectives import collective_bytes
    from pdm_tpu.parallel.mesh import (
        make_mesh, shard_batch, unet_with_sp, unet_with_tp,
    )

    net, sched, size = _flagship(dtype=jnp.float32, tiny=True)
    shapes = jax.eval_shape(
        lambda k: net.init(
            k, jnp.zeros((2, size, size, 3)), jnp.zeros((2,))
        )["params"],
        jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02, s.dtype
        ),
        shapes,
    )
    param_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
    )
    batch = jnp.asarray(
        rng.standard_normal((n_devices * 2, 3, size, size)), jnp.float32
    )

    def trainer_for(net_, fsdp=False):
        ddpm = UNetDDPM(
            scheduler=sched, params=params, module=net_, parametrization="eps"
        )
        return DDPMTrainer(
            ddpm=ddpm, learning_rate=1e-3, warmup_steps=2, total_iters=10,
            grad_clip=1.0, ema_decay=0.99, fsdp=fsdp,
        )

    out = {"devices": n_devices, "tiny_param_bytes": param_bytes,
           "strategies": {}}

    def record(name, hlo, axes):
        st = collective_bytes(hlo)
        out["strategies"][name] = {
            "bytes_by_kind": st.bytes_by_kind,
            "count_by_kind": st.count_by_kind,
            "axes": axes,
        }
        return st

    # ---- dp: all devices on 'data' -----------------------------------
    mesh = make_mesh(data=n_devices, model=1)
    with mesh:
        tr = trainer_for(net)
        state = tr.init_state(mesh=mesh)
        x = shard_batch(batch, mesh)
        hlo = tr._build_train_step().lower(
            state, jax.random.PRNGKey(0), x
        ).compile().as_text()
    record("dp", hlo, {"data": n_devices, "model": 1})

    # ---- dp_tp: half data, half model (channel TP) -------------------
    if n_devices >= 4:
        model_ax = 2
        mesh = make_mesh(data=n_devices // model_ax, model=model_ax)
        with mesh:
            tp_net = unet_with_tp(net, mesh)
            tr = trainer_for(tp_net)
            state = tr.init_state(mesh=mesh)
            x = shard_batch(batch, mesh)
            hlo = tr._build_train_step().lower(
                state, jax.random.PRNGKey(0), x
            ).compile().as_text()
        record("dp_tp", hlo,
               {"data": n_devices // model_ax, "model": model_ax})

    # ---- fsdp: ZeRO-3 over 'data' -------------------------------------
    mesh = make_mesh(data=n_devices, model=1)
    with mesh:
        tr = trainer_for(net, fsdp=True)
        state = tr.init_state(mesh=mesh)
        x = shard_batch(batch, mesh)
        hlo = tr._build_train_step().lower(
            state, jax.random.PRNGKey(0), x
        ).compile().as_text()
    record("fsdp", hlo, {"data": n_devices, "model": 1})

    # ---- sp: activation-H spatial partitioning (forward) --------------
    if n_devices >= 2:
        from jax.sharding import NamedSharding, PartitionSpec as P

        model_ax = 2
        mesh = make_mesh(data=n_devices // model_ax, model=model_ax)
        with mesh:
            sp_net = unet_with_sp(net, mesh)
            xs = jax.device_put(
                jnp.moveaxis(batch, 1, -1),
                NamedSharding(mesh, P("data", "model")),
            )
            tau = jnp.full((batch.shape[0],), 0.5, jnp.float32)

            def sp_fwd(p, x, t):
                return sp_net.apply({"params": p}, x, t, deterministic=True)

            hlo = jax.jit(sp_fwd).lower(params, xs, tau).compile().as_text()
        record("sp_fwd", hlo,
               {"data": n_devices // model_ax, "model": model_ax})

    # ---- stats: dataset-axis-sharded Boltzmann sweep -------------------
    from jax.sharding import PartitionSpec as P

    from pdm_tpu.ops.boltzmann_sweep import boltzmann_sweep_shard_body

    mesh = make_mesh(data=n_devices, model=1)
    temps = jnp.asarray([0.1, 1.0, 10.0], jnp.float32)
    data = jnp.reshape(
        jnp.arange(n_devices * 16 * 8, dtype=jnp.float32),
        (n_devices * 16, 8),
    ) / 100.0
    xq = jnp.ones((4, 8), jnp.float32)
    eps = jnp.ones((4, 8), jnp.float32) * 0.3
    with mesh:
        fn = jax.jit(jax.shard_map(
            lambda xx, ee, yy: boltzmann_sweep_shard_body(
                xx, ee, yy, temps, axis_name="data"
            ),
            mesh=mesh, in_specs=(P(), P(), P("data")), out_specs=P(),
            check_vma=False,
        ))
        hlo = fn.lower(xq, eps, data).compile().as_text()
    record("stats_sweep", hlo, {"data": n_devices, "model": 1})

    return out


# ---------------------------------------------------------------------
# analytic cost model + report rendering (host side, no jax needed)
# ---------------------------------------------------------------------

GiB = 1024.0 ** 3
MiB = 1024.0 ** 2


def _fmt_bytes(b: float) -> str:
    if b >= GiB:
        return f"{b / GiB:.2f} GiB"
    if b >= MiB:
        return f"{b / MiB:.2f} MiB"
    return f"{b / 1024.0:.1f} KiB"


def render(meas: dict, out_path: str) -> None:
    from pdm_tpu.parallel.collectives import (
        V5E_ICI_BW_PER_LINK, ici_seconds,
    )

    n = meas["devices"]
    pb = meas["tiny_param_bytes"]
    L = []
    L.append("# SCALING — multi-chip communication cost model (round 4)\n")
    L.append(
        "Per-step collective-byte accounting for every parallelism "
        "strategy, extracted\nfrom the optimized (post-GSPMD) HLO of the "
        "real compiled steps on an\n"
        f"{n}-device virtual mesh (`scripts/scaling_report.py`), validated "
        "against the\nclosed-form model, then projected onto v5e ICI for "
        "the flagship and 256x256\nmodel families. The reference has no "
        "distributed backend at all (SURVEY §5);\nthis document is the "
        "cost model for the scale-out layer this framework adds.\n"
    )
    L.append("## Measured per-chip collective bytes (tiny UNet probe)\n")
    L.append(
        f"Probe model: tiny 2-level UNet, params = {_fmt_bytes(pb)} fp32, "
        f"batch = {2 * n}\nimages, mesh = {n} virtual CPU devices. "
        "Post-SPMD HLO shapes are per-chip, so\nthese are bytes each chip "
        "moves per step.\n"
    )
    L.append("| strategy | mesh | collective | ops | per-chip bytes |")
    L.append("|---|---|---|---|---|")
    for name, s in meas["strategies"].items():
        axes = s["axes"]
        mesh_s = f"data={axes['data']} model={axes['model']}"
        kinds = s["bytes_by_kind"]
        if not kinds:
            L.append(f"| {name} | {mesh_s} | — | 0 | 0 |")
        for kind, b in sorted(kinds.items()):
            L.append(
                f"| {name} | {mesh_s} | {kind} | "
                f"{s['count_by_kind'][kind]} | {_fmt_bytes(b)} |"
            )
    L.append("")

    # ---- validation vs closed form ------------------------------------
    dp = meas["strategies"]["dp"]
    dp_ar = dp["bytes_by_kind"].get("all-reduce", 0)
    ratio = dp_ar / pb
    L.append("## Validation against the closed-form model\n")
    L.append(
        f"* **DP gradient all-reduce**: model says per-chip all-reduce "
        f"payload = the full\n  fp32 gradient pytree = parameter bytes = "
        f"{_fmt_bytes(pb)} (+ O(1) scalars for the\n  loss/grad-norm). "
        f"Measured: {_fmt_bytes(dp_ar)} — ratio {ratio:.3f}.\n"
    )
    checks = {"dp_allreduce_ratio": ratio}
    if "fsdp" in meas["strategies"]:
        f = meas["strategies"]["fsdp"]["bytes_by_kind"]
        ag, rs = f.get("all-gather", 0), f.get("reduce-scatter", 0)
        ar = f.get("all-reduce", 0)
        # all-gather result = full layer; expect ~2x params (fwd + bwd
        # re-gather; XLA may keep some alive => between 1x and 2x).
        # gradient reduction: reduce-scatter shards (~params/N result
        # bytes) OR, on backends whose partitioner prefers it, a full
        # all-reduce followed by a local slice (~params result bytes) —
        # same ring volume either way, so validate the SUM.
        grad_red = rs * n + ar  # normalized to full-gradient bytes
        L.append(
            f"* **FSDP (ZeRO-3)**: weight all-gather result bytes "
            f"measured {_fmt_bytes(ag)} = {ag / pb:.2f}x\n  params "
            f"(model: 1-2x — forward gather plus whatever the backward "
            f"re-gathers).\n  Gradient reduction measured "
            f"{_fmt_bytes(rs)} reduce-scatter shards + {_fmt_bytes(ar)} "
            f"all-reduce\n  = {grad_red / pb:.2f}x params of reduced "
            f"gradient (model: ~1x; this CPU-backend\n  partitioner "
            f"lowers the sharded-grad reduction as "
            f"all-reduce+slice — identical\n  ring volume to "
            f"reduce-scatter; the TPU partitioner emits reduce-scatter,\n"
            f"  which the multichip dryrun accepts as the ZeRO "
            f"signature).\n"
        )
        checks["fsdp_allgather_x_params"] = ag / pb
        checks["fsdp_grad_reduction_x_params"] = grad_red / pb
    if "sp_fwd" in meas["strategies"]:
        s = meas["strategies"]["sp_fwd"]["bytes_by_kind"]
        cp = s.get("collective-permute", 0)
        L.append(
            f"* **SP halo exchange**: collective-permute bytes measured "
            f"{_fmt_bytes(cp)} per chip per\n  forward. Model: each 3x3 "
            f"conv at a sharded resolution exchanges one boundary\n  row "
            f"each way = `2 x W x C x 4B x local_batch` per conv (see the "
            f"flagship\n  projection below for the closed form at scale)."
            f"\n"
        )
    L.append("")

    # ---- flagship + 256 projections -----------------------------------
    flag_params = 47_626_499  # cost_analysis-verified CIFAR flagship
    hr_params = 113_673_219  # 256x256 family (scripts/highres_probe.py)
    bw = V5E_ICI_BW_PER_LINK

    L.append("## v5e ICI projections (flagship CIFAR UNet, bs=128/chip)\n")
    L.append(
        "Assumptions: ICI ring per mesh axis at 45 GB/s/direction per "
        "link (2D torus,\nbidirectional rings => 90 GB/s effective per "
        "axis — the public v5e number the\nscaling book uses); fp32 "
        "gradients/weights; measured single-chip step time\n63.4 ms at "
        "bs=128 (BENCH_r03). Collectives here are NOT overlapped — "
        "these are\nworst-case adds; XLA's latency-hiding scheduler "
        "overlaps the gradient\nall-reduce with the tail of the backward "
        "in practice.\n"
    )
    L.append("| N chips | strategy | per-chip bytes/step | ICI time | % of 63.4 ms step |")
    L.append("|---|---|---|---|---|")
    rows = []
    for nn in (8, 16, 32, 64, 256):
        v = flag_params * 4
        t = ici_seconds("all-reduce", v, nn, bw)
        rows.append((nn, "DP grad all-reduce", v, t))
        ag = 2 * flag_params * 4
        rs_shard = flag_params * 4 / nn
        t2 = ici_seconds("all-gather", ag, nn, bw) + ici_seconds(
            "reduce-scatter", rs_shard, nn, bw
        )
        rows.append((nn, "FSDP gather+scatter", ag + rs_shard, t2))
    for nn, name, v, t in rows:
        L.append(
            f"| {nn} | {name} | {_fmt_bytes(v)} | {t * 1e3:.2f} ms | "
            f"{t / 0.0634 * 100:.1f}% |"
        )
    L.append("")
    dp_t8 = ici_seconds("all-reduce", flag_params * 4, 8, bw)
    L.append(
        f"**Weak scaling**: DP keeps per-chip batch fixed, so compute "
        f"stays 63.4 ms while\nthe all-reduce approaches its N→∞ "
        f"asymptote 2 x {_fmt_bytes(flag_params * 4)} / 90 GB/s = "
        f"{2 * flag_params * 4 / (2 * bw) * 1e3:.2f} ms\n(~"
        f"{dp_t8 / 0.0634 * 100:.0f}% overhead unoverlapped, amortizable "
        f"to near-zero since the UNet's\nbackward tail is far longer "
        f"than the reduce). Projected weak-scaling efficiency\nat N=256: "
        f">= {0.0634 / (0.0634 + ici_seconds('all-reduce', flag_params * 4, 256, bw)) * 100:.0f}% "
        f"un-overlapped, ~99% overlapped.\n"
    )

    # SP halos for the 256x256 family
    L.append("## Spatial parallelism at 256x256 (113.7M params, model axis = 8)\n")
    halo = 0
    # block_out_channels for the hr family: (128, 256, 256, 512, 512) at
    # resolutions 256,128,64,32,16; 2x(layers_per_block=2)+1 convs/level
    res_ch = [(256, 128), (128, 256), (64, 256), (32, 512), (16, 512)]
    convs_per_level = 2 * 2 + 1
    for res, ch in res_ch:
        if res // 8 < 2:  # below 2 rows/chip the shard has no interior
            continue
        halo += convs_per_level * 2 * res * ch * 2  # bf16, both directions
    L.append(
        f"Per-image halo traffic (bf16 activations, H sharded 8-way): "
        f"~{_fmt_bytes(halo)} per\nforward — at bs=8/chip that is "
        f"{_fmt_bytes(halo * 8)}/step, "
        f"{ici_seconds('collective-permute', halo * 8, 8, bw) * 1e3:.2f} ms of ICI "
        f"(vs the\n~150 ms 256x256 step measured in "
        f"scripts/highres_probe.py): halo cost is ~1%,\nwhich is why SP "
        f"is the right memory axis for the 256x256 family.\n"
    )

    # stats axis
    L.append("## Dataset-axis stats sharding\n")
    st = meas["strategies"].get("stats_sweep", {"bytes_by_kind": {}})
    sb = sum(st["bytes_by_kind"].values())
    L.append(
        f"The sharded Boltzmann sweep reduces ONLY the (n_temps x batch) "
        f"moment\naccumulators — measured {_fmt_bytes(sb)} per chip on the "
        f"probe (3 temps x 4 queries);\nat the production shape (96 temps "
        f"x 1024 queries x 4 moment fields, fp32) that\nis ~"
        f"{_fmt_bytes(96 * 1024 * 4 * 4 * 4)} per sweep against "
        f"{_fmt_bytes(50_000 * 3072 * 4)} of dataset it avoids\nmoving — "
        f"the dataset axis shards at ~0 communication cost, which is the "
        f"point\n(SURVEY §5's 'long-context analogue').\n"
    )

    L.append("## Shape regressions beyond n=8\n")
    L.append(
        "`tests/test_scaling.py` compiles the DP and DP+TP train steps "
        "and the sharded\nstats sweep on n=16 and n=32 virtual meshes "
        "(subprocess children, same recipe\nas the multihost test) and "
        "asserts the collective structure: gradient\nall-reduce bytes "
        "still equal the parameter bytes, the step executes, and the\n"
        "loss is finite — catching any shape assumption that only held "
        "at n=8.\n"
    )
    L.append(
        f"\n*(checks: {json.dumps({k: round(v, 3) for k, v in checks.items()})})*\n"
    )
    with open(out_path, "w") as f:
        f.write("\n".join(L))
    print(f"wrote {out_path}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.md"))
    ap.add_argument("--emit-json", action="store_true")
    args = ap.parse_args()

    if os.environ.get("_PDM_SCALING_CHILD") == "1" and args.emit_json:
        print(json.dumps(measure(args.devices)))
        return

    meas = _child(args.devices)
    with open(os.path.join(REPO, "scaling_measured.json"), "w") as f:
        json.dump(meas, f, indent=1)
    render(meas, args.out)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
