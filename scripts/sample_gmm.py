"""1-D GMM sampling experiment: analytic Bayes-optimal model, log-SNR and
(if present) optimized schedules, MMD evaluation, trajectory plots.

Parity: reference scripts/sample_gmm.py. Runs fully offline.
"""
import os

import numpy as np

from _common import setup_jax


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.diffusion.sampling import DDPMSampler
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.ops.mmd import mmd_rbf
    from pdm_tpu.schedulers.analytic import LogSNRScheduler
    from pdm_tpu.utils.synthetic import generate_gmm_1d

    print("Generating GMM dataset (1e6 samples)...")
    train_data = jnp.asarray(generate_gmm_1d(1_000_000))
    scheduler = LogSNRScheduler(1e-4, 1e1)
    ddpm = TrueDDPM(scheduler=scheduler, train_data=train_data)

    def run(log_temp=None, name="initial"):
        sampler = DDPMSampler(
            ddpm=ddpm, scheduler=scheduler, n_steps=10, obj_size=(1, 1, 1),
            batch_size=100, n_samples=100, step_type="ddpm",
            track_states=True, log_temp=log_temp,
        )
        out = sampler.sample(jax.random.PRNGKey(0))
        x = out["x"].reshape(-1)
        mmd = float(
            mmd_rbf(
                jnp.asarray(x[:, None]),
                train_data[:10_000].reshape(-1, 1),
                sigmas=(0.1,),
            )
        )
        print(f"{name} schedule MMD (sigma=0.1): {mmd:.6f}")
        return x, out.get("states"), mmd

    x_init, states, mmd_init = run()
    results = [("Initial", x_init, mmd_init)]

    if os.path.exists("optimized_log_temp.npz"):
        lt = jnp.asarray(np.load("optimized_log_temp.npz")["log_temp"])
        x_opt, _, mmd_opt = run(log_temp=lt, name="optimized")
        results.append(("Optimized", x_opt, mmd_opt))

    plt.figure(figsize=(12, 8))
    plt.hist(np.asarray(train_data[:10_000]).reshape(-1), bins=500,
             density=True, alpha=0.3, label="True Distribution (subset)")
    for name, x, mmd in results:
        plt.hist(x, bins=100, density=True, alpha=0.5,
                 label=f"{name} Samples (MMD: {mmd:.4f})")
    plt.legend()
    plt.title("GMM Sampling")
    plt.savefig("gmm_comparison.png")
    print("Saved gmm_comparison.png")

    if states is not None:
        traj = states.reshape(states.shape[0], -1)
        plt.figure(figsize=(10, 6))
        for i in range(min(5, traj.shape[1])):
            plt.plot(traj[::-1, i], label=f"Sample {i}")
        plt.legend()
        plt.title("Reverse Diffusion Trajectories")
        plt.savefig("gmm_trajectories.png")
        print("Saved gmm_trajectories.png")


if __name__ == "__main__":
    main()
