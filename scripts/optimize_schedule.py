"""Optimize the sampling schedule's log-temperature knots against
multi-scale MMD on the 1-D GMM -> optimized_log_temp.npz.

Parity: reference scripts/optimize_schedule.py.
"""
import numpy as np

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.diffusion.sampling import discretize_schedule
    from pdm_tpu.diffusion.schedule_opt import optimize_schedule
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.schedulers.analytic import LogSNRScheduler
    from pdm_tpu.utils.synthetic import generate_gmm_1d

    n_steps, n_iters = 10, 1000
    train_data = jnp.asarray(generate_gmm_1d(100_000))
    scheduler = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=scheduler, train_data=train_data)
    init = discretize_schedule(scheduler, n_steps)

    out = optimize_schedule(
        ddpm, train_data, init,
        n_iters=n_iters, batch_size=1024, learning_rate=1e-3,
        step_type="ddim",
        clip_range=(float(np.log(1e-4)), float(np.log(1e1))),
    )
    np.savez("optimized_log_temp.npz", log_temp=out["log_temp"])
    print(f"Optimized log_temp: {out['log_temp']}")

    plt.figure(figsize=(10, 5))
    plt.plot(out["history"])
    plt.title("MMD Optimization History (Multi-scale RBF)")
    plt.xlabel("Iteration"); plt.ylabel("MMD")
    plt.savefig("optimization_history.png")

    plt.figure(figsize=(10, 5))
    plt.plot(np.asarray(init), label="Initial (Linear Log-SNR)")
    plt.plot(out["log_temp"], label="Optimized")
    plt.legend(); plt.xlabel("Step index"); plt.ylabel("log_temp")
    plt.savefig("schedule_comparison.png")
    print("Saved optimization_history.png, schedule_comparison.png")


if __name__ == "__main__":
    main()
