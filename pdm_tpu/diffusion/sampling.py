"""Reverse-process sampler: a single fused ``lax.scan`` over noise levels.

Design (TPU-first, cf. reference ``diffusion/ddpm_sampling.py``):

* The schedule is discretized ONCE on the host into a ``(n_steps,)``
  log-temperature grid, from which all per-step coefficients (alpha_bar,
  the ancestral-DDPM x0/xt/noise coefficients, the DDIM coefficients) are
  precomputed as static-shape tables. The reference's per-step Python loop
  with data-dependent branches ("if prev_log_temp > -inf") becomes a scan
  whose final step simply has ``alpha_bar_prev == 1`` so the noise
  coefficient is analytically zero — no branches inside jit.
* One ``jax.random`` key per batch; per-step keys derived with
  ``jax.random.fold_in`` inside the scan (no host RNG in the loop).
* Optional bf16 compute policy for the model forward (the reference's
  fp16/bf16 autocast, ``ddpm_sampling.py:48-54``), accumulation in fp32.
* Data parallelism: the batch axis shards over the mesh 'data' axis; the
  whole scan is jit-compiled once and replicated via sharded inputs.

The ancestral (DDPM) and DDIM step rules follow the z-space algebra of the
reference's formulas.md "Sampling" section, expressed in x-space:

  DDPM:  x_prev = c_x0 * x0_hat + c_xt * xt + c_n * xi
         c_x0 = sqrt(ab_prev) beta / (1 - ab),
         c_xt = sqrt(alpha) (1 - ab_prev) / (1 - ab),
         c_n  = sqrt(beta (1 - ab_prev) / (1 - ab)),
         alpha = ab / ab_prev, beta = 1 - alpha
  DDIM:  x_prev = sqrt(ab_prev) x0_hat + sqrt(1 - ab_prev) eps_hat
  HEUN:  second-order probability-flow step (EDM-style, beyond the
         reference's two rules). In the temperature language the PF-ODE is
         linear in z = x / sqrt(ab) with dz/dsigma = eps and sigma =
         sqrt(T):   Euler predictor  z_p = z + (sig_prev - sig) eps_hat,
         then trapezoid corrector with eps re-evaluated at
         (z_p sqrt(ab_prev), log T_prev); the final step to sigma = 0
         stays Euler (the standard practice — there is no valid second
         eval at T = 0). 2 model evals per step except the last.
  DPMPP_2M: DPM-Solver++(2M) (Lu et al. 2022), data-prediction multistep:
         second-order accuracy at ONE model eval per step (Heun's order at
         DDIM's cost). In the log-SNR variable lambda = -log_temp/2 with
         step span h = lambda_next - lambda, the update extrapolates the
         two most recent x0 predictions,
             D = (1 + k) x0_i - k x0_{i-1},   k = h_i / (2 h_{i-1}),
             x_next = (sig_next/sig) xt + (a_next - sig_next a/sig) D,
         where a = sqrt(ab), sig here = sqrt(1 - ab). k = 0 on the first
         step (no history) and on the final step to the clean state
         (h = inf there; the standard lower-order-final rule), which makes
         every coefficient finite and the scan branch-free: with k = 0 the
         update reduces exactly to the DDIM rule.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core.temperature import alpha_bar_from_log_temp
from ..models.base import DDPM
from ..schedulers.base import Scheduler

STEP_TYPES = ("ddpm", "ddim", "heun", "dpmpp_2m")

# Stability envelope for the deterministic 2nd-order PF-ODE solver.
# Measured on the endurance checkpoint (scripts/endurance_heun_table.md):
# heun @ max T = 1e2 (sigma = 10) is the best few-NFE solver (FID 0.31 at
# 5 steps), but schedules whose top knot reaches T ~ 2.5e4 (sigma ~ 158,
# the cosine/entropy dataset temp_range) diverge catastrophically
# (FID 1e4-2e5) — ODE steps amplify what stochastic DDPM steps contract.
# Above this threshold the sampler warns at construction.
HEUN_VALIDATED_MAX_TEMP = 4.0e2


def discretize_schedule(
    scheduler: Scheduler,
    n_steps: int,
    *,
    max_log_temp: Optional[float] = None,
    log_temp: Optional[Array] = None,
) -> Array:
    """(n_steps,) descending-time grid of log temperatures.

    tau grid = linspace(0, 1, n+1)[1:], mapped through the schedule and
    clipped to the model's max temperature (parity: ddpm_sampling.py:33-41).
    A custom ``log_temp`` grid (e.g. an optimized schedule) bypasses the
    scheduler.
    """
    if log_temp is None:
        tau = jnp.linspace(0.0, 1.0, n_steps + 1)[1:]
        log_temp = scheduler.log_temp_from_tau(tau)
    log_temp = jnp.asarray(log_temp, jnp.float32)
    if max_log_temp is not None:
        log_temp = jnp.clip(log_temp, max=max_log_temp)
    return log_temp


def _step_tables(log_temp: Array) -> Dict[str, Array]:
    """Per-step coefficient tables for the scan, ordered high-T -> low-T.

    Step i goes from level i to level i-1; the last step goes to the clean
    state (log_temp = -inf, alpha_bar = 1).
    """
    ab = alpha_bar_from_log_temp(log_temp)  # ascending in T
    ab_prev = jnp.concatenate([jnp.ones((1,), ab.dtype), ab[:-1]])
    # Heun: sigma = sqrt(T) per level (sigma_prev = 0 at the clean state)
    # and a SAFE previous-level log-temp for the corrector's second model
    # eval (the final step is Euler, so its entry is just a placeholder
    # that must stay finite)
    # exp(log T / 2), NOT sqrt(exp(log T)): exact, underflow-graceful, and
    # finite-derivative everywhere (sqrt'(0) = inf would NaN the
    # schedule-opt gradient if a knot drifts very negative)
    sig = jnp.exp(0.5 * log_temp)
    sig_prev = jnp.concatenate([jnp.zeros((1,), sig.dtype), sig[:-1]])
    lt_prev_safe = jnp.concatenate([log_temp[:1], log_temp[:-1]])
    # reverse: step 0 of the scan is the highest temperature
    ab, ab_prev = ab[::-1], ab_prev[::-1]
    sig, sig_prev, lt_prev_safe = sig[::-1], sig_prev[::-1], lt_prev_safe[::-1]
    alpha = ab / ab_prev
    beta = 1.0 - alpha
    omab = 1.0 - ab

    def safe_sqrt(u):
        # sqrt with a zero (not inf) gradient at u == 0. The final step
        # has ab_prev == 1 exactly, so sqrt(1 - ab_prev) is sqrt(0) whose
        # derivative is inf; inf * 0 cotangent = NaN, which poisons the
        # schedule-optimization gradient (the double-where pattern keeps
        # the backward off the singular branch).
        pos = u > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, u, 1.0)), 0.0)

    # DPM-Solver++(2M): VP-convention amplitudes a = sqrt(ab) and noise
    # scales s = sqrt(1 - ab) of the source (current) and target (one
    # cooler) level; the target of the final step is the clean state
    # (a = 1, s = 0), so c_x = s_tgt/s_src = 0 and c_d = a_tgt = 1 there —
    # the update collapses to x0_hat with no infs anywhere. The history
    # weight k = h_i / (2 h_{i-1}) uses the log-SNR spans
    # h = (lt_src - lt_tgt)/2; it is zeroed on the first step (no history)
    # and the final step (h = inf; lower-order-final).
    lt_r = log_temp[::-1]  # scan order, hot -> cold
    a_src, s_src = jnp.sqrt(ab), safe_sqrt(1.0 - ab)
    a_tgt, s_tgt = jnp.sqrt(ab_prev), safe_sqrt(1.0 - ab_prev)
    n = lt_r.shape[0]
    if n > 1:
        h = 0.5 * (lt_r[:-1] - lt_r[1:])  # spans of the non-final steps
        k_mid = h[1:] / (2.0 * h[:-1])  # steps 1 .. n-2
        dpm_k = jnp.concatenate(
            [jnp.zeros((1,), h.dtype), k_mid, jnp.zeros((1,), h.dtype)]
        )
    else:
        dpm_k = jnp.zeros((1,), lt_r.dtype)
    return {
        "log_temp": lt_r,
        "ab": ab,
        "ab_prev": ab_prev,
        "ddpm_x0": jnp.sqrt(ab_prev) * beta / omab,
        "ddpm_xt": jnp.sqrt(alpha) * (1.0 - ab_prev) / omab,
        "ddpm_noise": safe_sqrt(beta * (1.0 - ab_prev) / omab),
        "ddim_x0": jnp.sqrt(ab_prev),
        "ddim_eps": safe_sqrt(1.0 - ab_prev),
        "sqrt_ab": jnp.sqrt(ab),
        "sqrt_ab_prev": jnp.sqrt(ab_prev),
        "sig": sig,
        "sig_prev": sig_prev,
        "heun_lt_prev": lt_prev_safe,
        "dpm_cx": s_tgt / s_src,
        "dpm_cd": a_tgt - s_tgt * a_src / s_src,
        "dpm_k": dpm_k,
    }


@dataclass(frozen=True)
class DDPMSampler:
    """Batched reverse-process sampler.

    Parity surface: reference DDPMSampler (ddpm_sampling.py:14-141) —
    n_steps / batch_size / n_samples / step_type / precision /
    track_states / custom log_temp grid.
    """

    ddpm: DDPM
    scheduler: Scheduler
    n_steps: int
    obj_size: Tuple[int, ...]
    batch_size: int = 1000
    n_samples: int = 1000
    step_type: str = "ddim"
    precision: str = "full"  # "full" | "half" (bf16 model compute)
    track_states: bool = False
    log_temp: Optional[Array] = None  # custom grid overrides scheduler
    batch_sharding: Optional[object] = None  # NamedSharding over 'data'
    # Safe-by-default: with step_type='heun', schedules whose top knot
    # exceeds HEUN_VALIDATED_MAX_TEMP are clamped to the validated
    # envelope (the deterministic PF-ODE measured FID 1e4-2e5 divergence
    # at T ~ 2.5e4, scripts/endurance_heun_table.md). Pass
    # heun_clamp=False to run the raw schedule (warns instead).
    heun_clamp: bool = True
    # XLA compiler options for the scan's jit, as a hashable tuple of
    # (flag, value) pairs — e.g. the measured-safe cold-compile reduction
    # (("xla_exec_time_optimization_effort", -0.5),). None = XLA default.
    compiler_options: Optional[tuple] = None

    def __post_init__(self):
        assert self.step_type in STEP_TYPES, self.step_type
        if self.step_type == "heun":
            import warnings

            raw = discretize_schedule(
                self.scheduler, self.n_steps,
                max_log_temp=self.ddpm.max_log_temp,
                log_temp=self.log_temp,
            )
            max_t = float(jnp.exp(jnp.max(raw)))
            if max_t > HEUN_VALIDATED_MAX_TEMP:
                if self.heun_clamp:
                    warnings.warn(
                        f"step_type='heun': clamping the schedule's max "
                        f"temperature {max_t:.3g} to the validated "
                        f"envelope {HEUN_VALIDATED_MAX_TEMP:.3g} (the "
                        f"PF-ODE diverges catastrophically above it — "
                        f"scripts/endurance_heun_table.md). Pass "
                        f"heun_clamp=False to run the raw schedule.",
                        stacklevel=2,
                    )
                else:
                    warnings.warn(
                        f"step_type='heun' with max schedule temperature "
                        f"{max_t:.3g} > validated envelope "
                        f"{HEUN_VALIDATED_MAX_TEMP:.3g} and "
                        f"heun_clamp=False: the deterministic PF-ODE "
                        f"measured catastrophic FID divergence at "
                        f"T ~ 2.5e4 (scripts/endurance_heun_table.md).",
                        stacklevel=2,
                    )

    def _grid(self) -> Array:
        max_lt = self.ddpm.max_log_temp
        if self.step_type == "heun" and self.heun_clamp:
            clamp = math.log(HEUN_VALIDATED_MAX_TEMP)
            max_lt = clamp if max_lt is None else min(float(max_lt), clamp)
        return discretize_schedule(
            self.scheduler,
            self.n_steps,
            max_log_temp=max_lt,
            log_temp=self.log_temp,
        )

    def batch_sample(self, key: jax.Array, batch_size: Optional[int] = None) -> Dict[str, Array]:
        bs = batch_size or self.batch_size
        grid = self._grid()
        xt, states = _jitted_sample_scan(self.compiler_options)(
            self.ddpm,
            grid,
            key,
            (bs, *self.obj_size),
            self.step_type,
            self.precision == "half",
            self.track_states,
            self.batch_sharding,
        )
        out = {"x": xt}
        if states is not None:
            out["states"] = states
        return out

    def sample(self, key: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
        """Generate ``n_samples`` in batches; gathers to host numpy.

        Parity: reference sample() loop (ddpm_sampling.py:134-141).
        """
        key = jax.random.PRNGKey(0) if key is None else key
        n_rep = math.ceil(self.n_samples / self.batch_size)
        chunks: Dict[str, list] = {}
        for i in range(n_rep):
            out = self.batch_sample(jax.random.fold_in(key, i))
            for k, v in out.items():
                chunks.setdefault(k, []).append(np.asarray(v))
        res = {}
        for k, v in chunks.items():
            if k == "states":
                # states are (n_steps, batch, ...): batches concat on axis 1
                res[k] = np.concatenate(v, axis=1)[:, : self.n_samples]
            else:
                res[k] = np.concatenate(v)[: self.n_samples]
        return res


def _jitted_sample_scan(compiler_options: Optional[tuple] = None):
    """The jitted sampler scan, keyed on XLA compiler options.

    The 1000-step flagship graph costs minutes of cold XLA compile at the
    default optimization effort; ``scripts/compile_budget.py`` measures
    which effort reductions keep throughput. Options arrive as a hashable
    tuple of (name, value) pairs; ``None`` = production default.
    """
    return _SAMPLE_SCAN_CACHE.setdefault(
        compiler_options,
        partial(
            jax.jit,
            static_argnames=(
                "sample_shape", "step_type", "half", "track_states",
                "batch_sharding", "remat",
            ),
            compiler_options=(
                dict(compiler_options) if compiler_options else None
            ),
        )(_sample_scan_impl),
    )


_SAMPLE_SCAN_CACHE: Dict[Optional[tuple], object] = {}


def _sample_scan_impl(
    ddpm: DDPM,
    grid: Array,
    key: jax.Array,
    sample_shape: Tuple[int, ...],
    step_type: str,
    half: bool,
    track_states: bool,
    batch_sharding=None,
    remat: bool = False,
):
    tables = _step_tables(grid)
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, sample_shape, dtype=jnp.float32)
    if batch_sharding is not None:
        # data-parallel sampling: pin the batch axis to the mesh 'data'
        # axis; every reverse step then stays chip-local (no collectives)
        xt = jax.lax.with_sharding_constraint(xt, batch_sharding)

    def step(carry, inp):
        xt = carry
        i, tab = inp
        x_in = xt.astype(jnp.bfloat16) if half else xt
        preds = ddpm.get_predictions(x_in, tab["log_temp"])
        x0 = preds.x0.astype(jnp.float32)
        if step_type == "ddpm":
            noise = jax.random.normal(
                jax.random.fold_in(key, i), xt.shape, dtype=jnp.float32
            )
            x_next = (
                tab["ddpm_x0"] * x0
                + tab["ddpm_xt"] * xt
                + tab["ddpm_noise"] * noise
            )
        elif step_type == "heun":
            # 2nd-order probability-flow step: z = x / sqrt(ab) makes the
            # ODE dz/dsigma = eps (sigma = sqrt(T)); Euler predictor +
            # trapezoid corrector. The final step to sigma = 0 is PEELED
            # out of the scan (see below), so every step here has a real
            # lower level to re-evaluate at.
            eps1 = preds.eps.astype(jnp.float32)
            z = xt / tab["sqrt_ab"]
            dsig = tab["sig_prev"] - tab["sig"]
            x_p = (z + dsig * eps1) * tab["sqrt_ab_prev"]
            x_p_in = x_p.astype(jnp.bfloat16) if half else x_p
            eps2 = ddpm.get_predictions(
                x_p_in, tab["heun_lt_prev"]
            ).eps.astype(jnp.float32)
            x_next = (z + dsig * 0.5 * (eps1 + eps2)) * tab["sqrt_ab_prev"]
        else:
            eps = preds.eps.astype(jnp.float32)
            x_next = tab["ddim_x0"] * x0 + tab["ddim_eps"] * eps
        return x_next, (x_next if track_states else None)

    if remat:
        # differentiating THROUGH the scan (schedule optimization) would
        # otherwise store every step's full UNet activations — 124 GB at
        # 5 steps x bs=256 on the flagship model. Rematerialize per step:
        # backward recomputes one forward at a time.
        step = jax.checkpoint(step)

    def dpm_step(carry, inp):
        xt, x0_prev = carry
        _, tab = inp
        x_in = xt.astype(jnp.bfloat16) if half else xt
        x0 = ddpm.get_predictions(x_in, tab["log_temp"]).x0.astype(
            jnp.float32
        )
        d = (1.0 + tab["dpm_k"]) * x0 - tab["dpm_k"] * x0_prev
        x_next = tab["dpm_cx"] * xt + tab["dpm_cd"] * d
        return (x_next, x0), (x_next if track_states else None)

    n = grid.shape[0]
    if step_type == "dpmpp_2m":
        if remat:
            dpm_step = jax.checkpoint(dpm_step)
        (x_final, _), states = jax.lax.scan(
            dpm_step, (xt, jnp.zeros_like(xt)), (jnp.arange(n), tables)
        )
    elif step_type == "heun":
        # peel the statically-known final Euler step (to sigma = 0 it
        # collapses to x0_hat) out of the scan: keeps the corrector's
        # second eval well-defined at every scanned step AND avoids a
        # dead masked UNet forward on the last iteration — real cost is
        # 2n-1 NFE, not 2n
        scan_tabs = jax.tree_util.tree_map(lambda t: t[:-1], tables)
        x_low, states = jax.lax.scan(
            step, xt, (jnp.arange(n - 1), scan_tabs)
        )
        x_in = x_low.astype(jnp.bfloat16) if half else x_low
        x_final = (
            ddpm.get_predictions(x_in, tables["log_temp"][-1])
            .x0.astype(jnp.float32)
        )
        if track_states:
            states = jnp.concatenate([states, x_final[None]], axis=0)
    else:
        x_final, states = jax.lax.scan(
            step, xt, (jnp.arange(n), tables)
        )
    if track_states:
        # reference stacks states low-T -> high-T (states[::-1]); our scan
        # emits high-T -> low-T, so flip the leading axis to match.
        states = states[::-1]
    return x_final, states


# default-options jitted scan: the module-level name every caller
# (schedule_opt, serving, tests) binds to
_sample_scan = _jitted_sample_scan(None)


def get_samples(
    ddpm: DDPM,
    scheduler: Scheduler,
    n_steps: int,
    obj_size: Tuple[int, ...],
    n_samples: int,
    batch_size: int = 1000,
    step_type: str = "ddim",
    precision: str = "full",
    track_states: bool = False,
    key: Optional[jax.Array] = None,
    log_temp: Optional[Array] = None,
    heun_clamp: bool = True,
) -> Dict[str, np.ndarray]:
    sampler = DDPMSampler(
        ddpm=ddpm,
        scheduler=scheduler,
        n_steps=n_steps,
        obj_size=obj_size,
        batch_size=batch_size,
        n_samples=n_samples,
        step_type=step_type,
        precision=precision,
        track_states=track_states,
        log_temp=log_temp,
        heun_clamp=heun_clamp,
    )
    return sampler.sample(key)
