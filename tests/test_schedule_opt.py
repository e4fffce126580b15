"""Schedule optimization: gradients flow through the scan sampler and the
optimized schedule improves (or at least doesn't regress) the MMD on the
1-D GMM."""

import jax
import jax.numpy as jnp
import numpy as np

from pdm_tpu.diffusion.sampling import discretize_schedule
from pdm_tpu.diffusion.schedule_opt import optimize_schedule, sample_with_grid
from pdm_tpu.models.base import TrueDDPM
from pdm_tpu.ops.mmd import mmd_rbf
from pdm_tpu.schedulers.analytic import LogSNRScheduler
from pdm_tpu.utils.synthetic import generate_gmm_1d


def test_gradients_flow_through_sampler():
    data = jnp.asarray(generate_gmm_1d(5_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    grid = discretize_schedule(sched, 6)

    def loss(lt):
        x = sample_with_grid(ddpm, lt, jax.random.PRNGKey(0), (32, 1, 1, 1))
        return jnp.mean(jnp.square(x))

    g = jax.grad(loss)(grid)
    assert g.shape == grid.shape
    assert float(jnp.abs(g).sum()) > 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_gradients_flow_through_dpmpp_2m():
    """The multistep solver's tables (log-SNR spans, history weights) are
    differentiable in the knots; gradients through its scan must be
    finite and nonzero so dpmpp_2m schedules can be optimized too."""
    data = jnp.asarray(generate_gmm_1d(5_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    grid = discretize_schedule(sched, 6)

    def loss(lt):
        x = sample_with_grid(
            ddpm, lt, jax.random.PRNGKey(0), (32, 1, 1, 1),
            step_type="dpmpp_2m",
        )
        return jnp.mean(jnp.square(x))

    g = jax.grad(loss)(grid)
    assert g.shape == grid.shape
    assert float(jnp.abs(g).sum()) > 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_optimize_schedule_improves_mmd():
    data = jnp.asarray(generate_gmm_1d(20_000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    init = discretize_schedule(sched, 8)

    def eval_mmd(lt, seed):
        x = sample_with_grid(ddpm, lt, jax.random.PRNGKey(seed), (512, 1, 1, 1))
        return float(
            mmd_rbf(x.reshape(-1, 1), data[:2000].reshape(-1, 1), sigmas=(0.1,))
        )

    before = np.mean([eval_mmd(init, s) for s in range(3)])
    out = optimize_schedule(
        ddpm, data, init, n_iters=30, batch_size=256, learning_rate=0.05,
        clip_range=(np.log(1e-4), np.log(1e1)), verbose=False,
    )
    lt = jnp.asarray(out["log_temp"])
    assert np.all(np.diff(out["log_temp"]) >= 0)
    after = np.mean([eval_mmd(lt, s) for s in range(3)])
    # must not regress; usually improves
    assert after <= before * 1.2, (before, after)
    assert len(out["history"]) == 30


def test_ddpm_step_gradient_finite_through_final_step():
    """The final reverse step has ab_prev == 1 exactly, so the noise
    coefficient is sqrt(0); without the double-where safe sqrt the
    backward emits inf * 0 = NaN into the lowest knot's gradient (only on
    the ddpm path — ddim's sqrt(0) cotangent lands on a constant and is
    discarded, which is why round-1's ddim-only runs never saw it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdm_tpu.diffusion.schedule_opt import sample_with_grid
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.schedulers.analytic import LogSNRScheduler
    from pdm_tpu.utils.synthetic import generate_gmm_1d

    data = jnp.asarray(generate_gmm_1d(2000))
    sched = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=sched, train_data=data)
    grid = jnp.linspace(np.log(1e-3), np.log(5.0), 5)

    for step_type in ("ddpm", "ddim", "heun"):
        def loss(lt):
            x = sample_with_grid(
                ddpm, lt, jax.random.PRNGKey(0), (64, 1, 1, 1), step_type
            )
            return jnp.mean(x**2)

        g = jax.grad(loss)(grid)
        assert bool(jnp.all(jnp.isfinite(g))), (step_type, g)
