"""DDPM trainer: one donated, jit-compiled, mesh-sharded train step.

Capability parity with the reference trainer (``diffusion/ddpm_trainer.py``):
Adam(betas, weight decay), linear warmup -> linear decay LR, EMA of
parameters, global-norm gradient clipping, MSE loss on the parametrization
target with uniform-tau noise sampling, periodic eval hook (sample + FID),
checkpointing with auto-resume, per-step metric logging.

TPU-first differences:
  * the whole step (noise draw, forward, loss, backward, optimizer, EMA) is
    ONE jit graph with donated state — no host round-trips per step;
  * batch shards over the mesh 'data' axis, parameters shard over 'model'
    (tensor parallelism) via NamedSharding — XLA inserts the psum for
    gradient reduction;
  * data is device-resident (the whole dataset lives in HBM; per-step
    minibatch selection is a device-side gather keyed by the step RNG),
    removing the reference's per-step host->device copy
    (ddpm_trainer.py:194);
  * checkpoints via Orbax (async-capable), resume contract identical.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from ..core.temperature import alpha_bar_from_log_temp, bcast_right
from ..models.predictions import convert_prediction, training_target
from ..models.unet_ddpm import UNetDDPM
from ..schedulers.base import Scheduler


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: Array
    params: Any
    ema_params: Any
    opt_state: Any


def warmup_linear_decay(
    learning_rate: float, warmup_steps: int, total_iters: int
) -> optax.Schedule:
    """Linear 0 -> lr over warmup, then linear lr -> 0 at total_iters.

    Parity: reference LambdaLR lr_lambda (ddpm_trainer.py:47-56).
    """

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (total_iters - count) / jnp.maximum(1.0, total_iters - warmup_steps)
        )
        return learning_rate * jnp.where(count < warmup_steps, warm, decay)

    return schedule


def make_optimizer(
    learning_rate: float,
    weight_decay: float,
    betas: Tuple[float, float],
    warmup_steps: int,
    total_iters: int,
    grad_clip: float,
) -> optax.GradientTransformation:
    sched = (
        warmup_linear_decay(learning_rate, warmup_steps, total_iters)
        if warmup_steps > 0
        else learning_rate
    )
    tx = [optax.clip_by_global_norm(grad_clip)] if grad_clip > 0 else []
    if weight_decay:
        # BEFORE the Adam moments: coupled L2, matching the reference's
        # torch.optim.Adam(weight_decay=...) semantics (ddpm_trainer.py)
        # rather than decoupled AdamW
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    tx.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*tx)


def _dropout_key(key: jax.Array, impl: Optional[str]) -> jax.Array:
    """Re-key the dropout RNG stream onto a cheaper generator.

    Threefry mask generation is VPU-bound and costs ~18% of the flagship
    train step (measured: 156 -> 133 ms at bs=256 with ``rbg``). The
    hardware RngBitGenerator is the TPU-native choice for dropout masks:
    the masks are statistically equivalent, only not bit-reproducible
    across backends/XLA versions (loss curves, not semantics). The seed
    material still comes from the caller's threefry stream, so step
    decorrelation is inherited.
    """
    if impl is None or impl == "threefry":
        return key
    if jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
        data = jax.random.key_data(jax.random.split(key, 2)).reshape(-1)
    else:
        data = jax.random.split(key, 2).reshape(-1)
    return jax.random.wrap_key_data(data[:4].astype(jnp.uint32), impl=impl)


@dataclasses.dataclass
class DDPMTrainer:
    ddpm: UNetDDPM
    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    warmup_steps: int = 5000
    total_iters: int = 1_500_000
    grad_clip: float = 10.0
    ema_decay: float = 0.9999
    checkpoint_dir: Optional[str] = None
    eval_steps: int = 50_000
    eval_fn: Optional[Callable[[UNetDDPM, int], Dict[str, float]]] = None
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None
    checkpoint_every: Optional[int] = None  # defaults to eval_steps
    # retention: keep this many newest COMPLETE checkpoints (the published
    # one always survives). None (the library default) keeps everything —
    # pruning is destructive, so it is opt-in; the config-driven recipe
    # (ddpm_training.keep_checkpoints, YAML default 3) enables it, since
    # at the reference's 1.5M-iter cadence unbounded step_{n} dirs are
    # ~280 GB of disk.
    keep_checkpoints: Optional[int] = None
    horizontal_flip: bool = False  # on-device per-batch augmentation
    timer: Optional[object] = None  # utils.profiling.PhaseTimer
    # dropout-mask generator: "rbg" (hardware RngBitGenerator, measured
    # +17% step throughput) or "threefry" (bit-reproducible everywhere)
    dropout_rng_impl: Optional[str] = "rbg"
    # forward-process noise generator (the per-step uniform tau + normal
    # eps draws in loss_fn): same trade as dropout_rng_impl. The seed
    # material still derives from the caller's threefry stream, so steps
    # stay decorrelated and runs stay deterministic for a fixed impl.
    noise_rng_impl: Optional[str] = "rbg"
    # what the mesh 'model' axis shards: "channel" (tensor parallelism)
    # or "spatial" (activation-H spatial parallelism, replicated params)
    model_partition: str = "channel"
    # layout of the x0 batches this trainer is fed: "nchw" (the reference
    # contract, ddpm_trainer.py:194) or "nhwc" (TPU-native; zero layout
    # transposes in the hot path). With "nchw" the step transposes x0
    # ONCE up front and runs the forward, target, and MSE natively in
    # NHWC — the loss value is layout-invariant either way.
    data_layout: str = "nchw"
    # fully-sharded data parallelism (ZeRO-3): parameters, EMA, and Adam
    # moments shard over the mesh 'data' axis (1/data_size per chip);
    # GSPMD all-gathers weights per layer and reduce-scatters gradients.
    # Composes with either model partition. New capability vs the
    # reference (single-accelerator, SURVEY §5).
    fsdp: bool = False
    # gradient accumulation: split each global batch into this many
    # sequential micro-batches inside the one jitted step (lax.scan over
    # per-micro-batch grads, one optimizer/EMA application). Reaches the
    # reference recipe's global batch (ddpm_training.yaml bs=128..) on
    # memory-tight configs (256x256 models) with identical optimizer math.
    grad_accum: int = 1
    # unroll the accumulation scan: for small grad_accum the unrolled
    # per-micro grads fuse into each backward's epilogue (no carried
    # gradient buffer round-trip through HBM per micro-step), at the cost
    # of a grad_accum-times-larger compiled graph. Identical math.
    accum_unroll: bool = False
    # XLA compiler options for the train-step jit, as a hashable tuple of
    # (flag, value) pairs — same knob as DDPMSampler.compiler_options
    # (e.g. (("xla_exec_time_optimization_effort", 1.0),)). None = XLA
    # default. scripts/train_decompose.py measures the effect per flag.
    compiler_options: Optional[tuple] = None

    def __post_init__(self):
        import threading

        self.optimizer = make_optimizer(
            self.learning_rate, self.weight_decay, self.betas,
            self.warmup_steps, self.total_iters, self.grad_clip,
        )
        self._lr_schedule = warmup_linear_decay(
            self.learning_rate, self.warmup_steps, self.total_iters
        )
        # Eager: a lazily-created lock could itself be created twice by
        # the main thread and a background publisher racing on hasattr.
        self._pub_lock = threading.Lock()
        self._pending_step: Optional[int] = None

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, mesh=None) -> TrainState:
        # copy: train_step donates the state, so the state must not alias
        # the model's (reusable) parameter buffers
        params = jax.tree_util.tree_map(jnp.copy, self.ddpm.params)
        if mesh is not None:
            # place params (and hence ema/opt_state, which derive from
            # them — zeros_like/copy preserve sharding) with the
            # model-parallel (+FSDP) sharding BEFORE building the
            # optimizer state, so the whole TrainState shares one layout
            from ..parallel.mesh import shard_params

            params = shard_params(
                params, mesh, self.model_partition, fsdp=self.fsdp
            )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.optimizer.init(params),
        )

    # ------------------------------------------------------------------
    # the jitted step
    # ------------------------------------------------------------------

    def loss_fn(
        self, params: Any, key: jax.Array, x0: Array
    ) -> Tuple[Array, Dict[str, Array]]:
        sched: Scheduler = self.ddpm.scheduler
        key_noise, key_drop = jax.random.split(key)
        key_noise = _dropout_key(key_noise, self.noise_rng_impl)
        key_drop = _dropout_key(key_drop, self.dropout_rng_impl)
        # Everything downstream runs in the conv-native NHWC layout: the
        # noise draw, the forward, the target, and the MSE. An NCHW batch
        # (the reference data contract) pays ONE gradient-free transpose
        # here; an NHWC-resident dataset (data_layout="nhwc") pays none.
        # Round 4 transposed xt in and pred back out, keeping a transpose
        # pair (+ its cotangent transpose) inside the grad path
        # (TRAIN_ROOFLINE.md loss-wrapper attribution).
        if self.data_layout == "nchw":
            x0 = jnp.transpose(x0, (0, 2, 3, 1))
        tau, eps, xt = sched.add_noise(key_noise, x0)
        log_temp = sched.log_temp_from_tau(tau)
        ab = alpha_bar_from_log_temp(log_temp)

        pred = self.ddpm.module.apply(
            {"params": params}, xt, tau,
            deterministic=False, rngs={"dropout": key_drop},
        )
        target = training_target(x0, eps, ab, self.ddpm.parametrization)
        loss = jnp.mean(jnp.square(pred - target.astype(pred.dtype)))
        return loss, {"loss": loss}

    def _build_train_step(self, micro_sharding=None):
        def accum_grads(params, key: jax.Array, x0: Array):
            """Mean loss/grads over ``grad_accum`` sequential micro-batches
            (a lax.scan, so peak activation memory is one micro-batch).
            Per-micro keys are fold_in(key, i) — decorrelated noise/dropout
            draws, same contract as independent steps."""
            a = self.grad_accum
            micro = x0.reshape(a, x0.shape[0] // a, *x0.shape[1:])
            if micro_sharding is not None:
                # keep each micro-batch laid out over the mesh 'data' axis
                # (the reshape would otherwise leave XLA free to pick a
                # degenerate layout that serializes the scan body)
                micro = jax.lax.with_sharding_constraint(
                    micro, micro_sharding
                )

            def body(carry, inp):
                i, xm = inp
                (l, _), g = jax.value_and_grad(self.loss_fn, has_aux=True)(
                    params, jax.random.fold_in(key, i), xm
                )
                g_sum, l_sum = carry
                return (
                    jax.tree_util.tree_map(jnp.add, g_sum, g),
                    l_sum + l,
                ), None

            # carry in param dtype so the accum path feeds the optimizer
            # grads of the same dtype as the non-accum path (bf16 params
            # would otherwise silently get f32 optimizer state here only)
            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params
            )
            (g_sum, l_sum), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32)),
                (jnp.arange(a), micro),
                unroll=a if self.accum_unroll else 1,
            )
            inv = 1.0 / a
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            loss = l_sum * inv
            return loss, {"loss": loss}, grads

        def step(state: TrainState, key: jax.Array, x0: Array):
            if self.grad_accum > 1:
                loss, metrics, grads = accum_grads(state.params, key, x0)
            else:
                (loss, metrics), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True
                )(state.params, key, x0)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            ema = optax.incremental_update(
                params, state.ema_params, 1.0 - self.ema_decay
            )
            out_metrics = dict(metrics)
            out_metrics["grad_norm"] = optax.global_norm(grads)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                ema_params=ema,
                opt_state=opt_state,
            )
            return new_state, out_metrics

        return jax.jit(
            step,
            donate_argnums=(0,),
            compiler_options=(
                dict(self.compiler_options) if self.compiler_options else None
            ),
        )

    def train_step(
        self, state: TrainState, key: jax.Array, x0: Array
    ) -> Tuple[TrainState, Dict[str, Array]]:
        # cache keyed on the micro-batch sharding AND the module's
        # activation constraints: train() on a mesh and a later
        # direct/mesh-less call each get their own compiled step
        # (NamedSharding is hashable), instead of reusing a step with a
        # stale layout constraint baked in
        ms = getattr(self, "_micro_sharding", None)
        mod = self.ddpm.module
        # every post-construction-mutable knob the compiled step closes
        # over is part of the key (ADVICE r4: a mutated rng impl must not
        # silently reuse a stale compiled step)
        ck = (
            ms,
            getattr(mod, "act_sharding", None),
            getattr(mod, "head_sharding", None),
            self.compiler_options,
            self.noise_rng_impl,
            self.dropout_rng_impl,
            self.data_layout,
        )
        cache = getattr(self, "_train_step_cache", None)
        if cache is None:
            cache = self._train_step_cache = {}
        if ck not in cache:
            cache[ck] = self._build_train_step(micro_sharding=ms)
        return cache[ck](state, key, x0)

    # ------------------------------------------------------------------
    # checkpointing (Orbax; resume contract = reference's latest.pth)
    # ------------------------------------------------------------------

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        if not hasattr(self, "_ckptr"):
            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def _publish_pending(self, expected_step: Optional[int] = None) -> None:
        """After a save is known complete, point latest.txt at it. Never
        publishes an in-flight save, so a crash mid-write can't leave the
        resume pointer at an unreadable checkpoint.

        ``expected_step`` guards the background-publisher path: a stale
        thread whose wait_until_finished() returned for save N must not
        publish after the main thread has started save N+1 (at which point
        ``_pending_step`` is N+1 and still in flight). Passing the step it
        waited for makes the publish conditional, restoring the invariant
        under thread preemption."""
        with self._pub_lock:
            step = self._pending_step
            if step is None:
                return
            if expected_step is not None and step != expected_step:
                return
            latest = os.path.join(self.checkpoint_dir, "latest.txt")
            with open(latest, "w") as f:
                f.write(str(step))
            self._pending_step = None
        self._prune_checkpoints(published=step)

    def _prune_checkpoints(self, published: int) -> None:
        """Delete step_{n} dirs beyond the ``keep_checkpoints`` newest.

        Crash-safe by construction: only steps STRICTLY OLDER than the
        just-published one are candidates (an in-flight newer save is
        never touched), and the published checkpoint itself is always
        retained, so latest.txt always points at an existing complete
        save."""
        if self.keep_checkpoints is None or self.checkpoint_dir is None:
            return
        import re
        import shutil

        steps = []
        for name in os.listdir(self.checkpoint_dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m and int(m.group(1)) < published:
                steps.append(int(m.group(1)))
        steps.sort(reverse=True)
        # the published save counts toward the retention budget
        for s in steps[max(self.keep_checkpoints - 1, 0):]:
            shutil.rmtree(
                os.path.join(self.checkpoint_dir, f"step_{s}"),
                ignore_errors=True,
            )

    def save_checkpoint(
        self, state: TrainState, step: int, block: bool = True
    ) -> None:
        """Checkpoint via Orbax. With ``block=False`` (the training loop's
        mode) the write streams asynchronously while training continues;
        the previous save is awaited (and published) before a new one
        starts, so at most one is in flight."""
        if self.checkpoint_dir is None:
            return
        ckptr = self._checkpointer()
        ckptr.wait_until_finished()
        self._publish_pending()
        path = os.path.abspath(os.path.join(self.checkpoint_dir, f"step_{step}"))
        ckptr.save(path, jax.device_get(dataclasses.asdict(state)), force=True)
        with self._pub_lock:
            self._pending_step = step
        if block:
            ckptr.wait_until_finished()
            self._publish_pending()
        else:
            # publish as soon as THIS save completes rather than waiting
            # for the next save to begin: without this, a crash loses up
            # to TWO checkpoint cadences (a complete-but-unpublished save
            # sits on disk while latest.txt points one further back) —
            # observed in the round-2 endurance run when the device
            # tunnel dropped mid-interval
            import threading

            def _bg(expected_step=step):
                try:
                    ckptr.wait_until_finished()
                    # conditional: only publish if a newer save hasn't
                    # superseded this one while we were preempted
                    self._publish_pending(expected_step=expected_step)
                except Exception:
                    pass  # next save / finalize republishes

            threading.Thread(target=_bg, daemon=True).start()

    def finalize_checkpoints(self) -> None:
        if hasattr(self, "_ckptr"):
            self._ckptr.wait_until_finished()
            self._publish_pending()

    def latest_checkpoint_step(self) -> Optional[int]:
        if self.checkpoint_dir is None:
            return None
        latest = os.path.join(self.checkpoint_dir, "latest.txt")
        if not os.path.exists(latest):
            return None
        with open(latest) as f:
            return int(f.read().strip())

    def load_checkpoint(self, state: TrainState, step: int) -> TrainState:
        """Restore, preserving the template state's placement: Orbax hands
        back host arrays, so a mesh-sharded template (TP/DP layouts from
        init_state(mesh=...)) must be re-device_put or the next train_step
        would silently run with compiler-default replicated params."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.checkpoint_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, jax.device_get(dataclasses.asdict(state)))
        out = TrainState(**restored)
        shardings = jax.tree_util.tree_map(lambda x: x.sharding, state)
        return jax.tree_util.tree_map(
            lambda v, s: jax.device_put(jnp.asarray(v), s), out, shardings
        )

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------

    def train(
        self,
        data: Array,
        batch_size: int,
        total_iters: Optional[int] = None,
        key: Optional[jax.Array] = None,
        log_every: int = 100,
        mesh=None,
    ) -> TrainState:
        """Device-resident-data training loop with auto-resume.

        ``data``: (N, C, H, W) array already placed on device(s).
        ``mesh``: optional ('data','model') Mesh — the batch shards over
        'data' (DP) and parameters over 'model' (TP); the step math is
        unchanged, XLA inserts the gradient psum.
        """
        total = total_iters or self.total_iters
        key = jax.random.PRNGKey(0) if key is None else key

        if self.grad_accum > 1 and batch_size % self.grad_accum != 0:
            raise ValueError(
                f"batch_size={batch_size} is not divisible by "
                f"grad_accum={self.grad_accum}"
            )

        batch_out_sharding = None
        # reset per-train() mutable derivations: the micro-batch sharding
        # constraint and any mesh-specific module activation constraints
        # applied by a previous train(mesh=...) call must not leak into
        # this run (a meshless rerun would otherwise trace sharding
        # constraints for devices it no longer uses)
        self._micro_sharding = None
        if not hasattr(self, "_base_ddpm"):
            self._base_ddpm = self.ddpm
        self.ddpm = self._base_ddpm
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import (
                batch_sharding, check_batch_divisible, replicated,
                unet_with_model_parallel,
            )

            check_batch_divisible(batch_size, mesh)
            if self.grad_accum > 1:
                check_batch_divisible(
                    batch_size // self.grad_accum, mesh,
                    what="batch_size // grad_accum",
                )
                self._micro_sharding = NamedSharding(mesh, P(None, "data"))
            if mesh.shape.get("model", 1) > 1 and hasattr(
                self.ddpm.module, "act_sharding"
            ):
                # model-parallel activation constraints in the UNet:
                # channel TP (+ head sharding) or spatial SP (H axis)
                self.ddpm = dataclasses.replace(
                    self.ddpm,
                    module=unet_with_model_parallel(
                        self.ddpm.module, mesh, self.model_partition
                    ),
                )
            batch_out_sharding = batch_sharding(mesh)
            if hasattr(data, "devices"):
                # replicate the (small vs HBM) dataset across the mesh so
                # the per-step gather is chip-local; the selected batch is
                # then laid out over 'data'
                data = jax.device_put(data, replicated(mesh))
        state = self.init_state(mesh=mesh)

        start = 0
        resume = self.latest_checkpoint_step()
        if resume is not None:
            state = self.load_checkpoint(state, resume)
            start = resume

        n = data.shape[0] if hasattr(data, "shape") else len(data)
        ckpt_every = self.checkpoint_every or self.eval_steps
        host_resident = not hasattr(data, "devices")  # HostResidentData

        _jit_kw = (
            {"out_shardings": batch_out_sharding}
            if batch_out_sharding is not None
            else {}
        )

        @partial(jax.jit, donate_argnums=(), **_jit_kw)
        def augment(x, step_key):
            if self.horizontal_flip:
                # the reference flips in its host-side transform pipeline
                # (data.py:46-49); here it's a fused on-device where.
                # The W axis is last in NCHW, second-to-last in NHWC.
                flip = jax.random.bernoulli(
                    jax.random.fold_in(step_key, 1), 0.5, (x.shape[0],)
                )
                flipped = (
                    x[..., ::-1, :] if self.data_layout == "nhwc"
                    else x[..., ::-1]
                )
                x = jnp.where(flip[:, None, None, None], flipped, x)
            return x

        @partial(jax.jit, donate_argnums=(), **_jit_kw)
        def select_batch(data, step_key):
            # data must be an ARGUMENT, not a closure capture: a captured
            # concrete array is embedded in the lowered program as a
            # constant, which bloats the HLO by the whole dataset's bytes
            # (and overflows the remote-compile transport at CIFAR scale)
            idx = jax.random.randint(step_key, (batch_size,), 0, n)
            return augment(jnp.take(data, idx, axis=0), step_key)

        import numpy as _np

        def host_batch_indices(it: int) -> _np.ndarray:
            # Step-keyed (seed, it) stream, mirroring the device-resident
            # path's fold_in(key, it): a resumed run at step k continues
            # with draw k+1 instead of restarting the stream from draw 1
            # (a fresh RandomState(0) per train() call would re-train on
            # the exact early-stream batches after every resume).
            return _np.random.default_rng((0, it)).integers(0, n, batch_size)

        import contextlib

        def phase(name, tree=None):
            if self.timer is None:
                return contextlib.nullcontext()
            return self.timer.phase(name, sync_tree=tree)

        for it in range(start + 1, total + 1):
            step_key = jax.random.fold_in(key, it)
            with phase("data"):
                if host_resident:
                    idx = host_batch_indices(it)
                    x0 = augment(
                        data.device_batch(idx), jax.random.fold_in(step_key, 1)
                    )
                else:
                    x0 = select_batch(data, jax.random.fold_in(step_key, 1))
            with phase("train_step"):
                state, metrics = self.train_step(
                    state, jax.random.fold_in(step_key, 2), x0
                )
                if self.timer is not None:
                    from ..utils.timing import sync as _sync

                    _sync(metrics)

            if self.log_fn is not None and it % log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["learning_rate"] = float(self._lr_schedule(it))
                self.log_fn(it, host)

            if it % ckpt_every == 0:
                self.save_checkpoint(state, it, block=False)
            if self.eval_fn is not None and it % self.eval_steps == 0:
                ema_ddpm = self.ddpm.with_params(state.ema_params)
                eval_metrics = self.eval_fn(ema_ddpm, it)
                if self.log_fn is not None and eval_metrics:
                    self.log_fn(it, eval_metrics)

        self.finalize_checkpoints()
        return state
