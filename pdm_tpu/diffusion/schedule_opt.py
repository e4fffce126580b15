"""Differentiable noise-schedule optimization.

Optimizes the ``(n_steps,)`` log-temperature knot vector of the sampling
schedule by gradient descent on a distributional loss (multi-scale RBF MMD
against training data), with a sort projection for monotonicity and
clamping to the scheduler's range.

Capability parity: reference ``scripts/optimize_schedule.py``
(DifferentiableSampler + MMD optimization loop). TPU-first: the reverse
process is the SAME branch-free ``lax.scan`` used for inference
(diffusion/sampling.py) — JAX differentiates through the scan directly, so
there is no separate hand-written "differentiable sampler"; one jitted
value_and_grad per iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from ..models.base import DDPM
from ..ops.mmd import mmd_rbf
from .sampling import _sample_scan

DEFAULT_SIGMAS = (0.01, 0.05, 0.1, 0.5)


def sample_with_grid(
    ddpm: DDPM,
    log_temp_grid: Array,
    key: jax.Array,
    sample_shape: Tuple[int, ...],
    step_type: str = "ddim",
    remat: bool = False,
) -> Array:
    """Reverse process on an explicit (differentiable) log-temp grid.

    ``remat`` checkpoints each reverse step so the backward pass
    recomputes one forward at a time instead of storing all of them —
    REQUIRED for UNet-scale models (5 steps x bs=256 on the flagship
    stores 124 GB otherwise). Keep it off for TrueDDPM: rematerializing
    the streaming online-softmax posterior produces NaN gradients at
    chunked dataset sizes (jax.checkpoint x lax.scan-accumulator
    interaction), and the analytic model doesn't need the memory."""
    x, _ = _sample_scan(
        ddpm, log_temp_grid, key, sample_shape, step_type, False, False,
        remat=remat,
    )
    return x


def optimize_schedule(
    ddpm: DDPM,
    train_data: Array,
    init_log_temp: Array,
    *,
    n_iters: int = 1000,
    batch_size: int = 1024,
    learning_rate: float = 1e-3,
    step_type: str = "ddim",
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
    clip_range: Optional[Tuple[float, float]] = None,
    grad_clip: float = 1.0,
    key: Optional[jax.Array] = None,
    log_every: int = 100,
    verbose: bool = True,
    feature_fn: Optional[Callable[[Array], Array]] = None,
    remat: bool = False,
) -> Dict[str, np.ndarray]:
    """Returns {"log_temp": optimized grid, "history": per-iter MMD}.

    ``feature_fn`` (optional, differentiable, e.g. a trained LeNet's
    feature head) maps (B, *obj_size) -> (B, F) before the MMD — a
    perceptual-space objective that aligns the optimization with FID far
    better than raw-pixel MMD at image scale."""
    key = jax.random.PRNGKey(0) if key is None else key
    obj_size = tuple(train_data.shape[1:])
    data2d = train_data.reshape(train_data.shape[0], -1)
    n = train_data.shape[0]

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip), optax.adam(learning_rate)
    )
    log_temp = jnp.asarray(init_log_temp, jnp.float32)
    opt_state = tx.init(log_temp)

    @jax.jit
    def step(ddpm, data2d, log_temp, opt_state, key):
        # ddpm (param pytree) and data2d are jit ARGUMENTS: closure capture
        # would embed them in the lowered program as HLO constants —
        # hundreds of MB at flagship scale (same failure mode the trainer's
        # select_batch documents)

        # monotonicity via sort projection + range clamp (applied to the
        # *input* of the iteration, parity with the reference's
        # pre-iteration projection)
        log_temp = jnp.sort(log_temp)
        if clip_range is not None:
            log_temp = jnp.clip(log_temp, clip_range[0], clip_range[1])

        k_data, k_sample = jax.random.split(key)

        def loss_fn(lt):
            gen = sample_with_grid(
                ddpm, lt, k_sample, (batch_size, *obj_size), step_type,
                remat=remat,
            )
            idx = jax.random.randint(k_data, (batch_size,), 0, n)
            ref = data2d[idx]
            if feature_fn is not None:
                gen2d = feature_fn(gen)
                ref2d = feature_fn(ref.reshape(batch_size, *obj_size))
            else:
                gen2d, ref2d = gen.reshape(batch_size, -1), ref
            return mmd_rbf(gen2d, ref2d, sigmas=tuple(sigmas))

        loss, grads = jax.value_and_grad(loss_fn)(log_temp)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(log_temp, updates), opt_state, loss

    data2d = jnp.asarray(data2d)
    history = []
    for i in range(n_iters):
        log_temp, opt_state, loss = step(
            ddpm, data2d, log_temp, opt_state, jax.random.fold_in(key, i)
        )
        history.append(float(loss))
        if verbose and (i + 1) % log_every == 0:
            print(f"iter {i + 1}/{n_iters} mmd {history[-1]:.6f}")

    final = jnp.sort(log_temp)
    if clip_range is not None:
        final = jnp.clip(final, clip_range[0], clip_range[1])
    return {"log_temp": np.asarray(final), "history": np.asarray(history)}
