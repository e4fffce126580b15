"""High-dimensional physics experiment: 100-D anisotropic GMM, forward +
metric stats, entropy/metric schedules vs cosine/log-SNR, true-model
sampling, MMD/KL/occupancy evaluation, diagnostic plots.

Parity: reference scripts/reproduce_high_dim.py. Fully synthetic/offline;
the stats sweeps and sampling run on TPU, the GMM fit for KL uses sklearn
on host.
"""
import os

import numpy as np

from _common import ensure_dirs, setup_jax


def compute_kl_gmm(samples, true_means, true_covs):
    """KL(P_induced || P_true) by fitting a GMM to generated samples and MC
    integration (parity: reference compute_kl_gmm)."""
    from scipy.stats import multivariate_normal
    from sklearn.mixture import GaussianMixture

    dim = samples.shape[1]
    n_comp = len(true_means)
    gmm = GaussianMixture(
        n_components=n_comp, covariance_type="full", init_params="random",
        n_init=3, random_state=42, reg_covar=1e-4, max_iter=200,
    )
    gmm.fit(samples)
    w = gmm.weights_.astype(np.float64)
    w /= w.sum()
    gmm.weights_ = w

    x_mc, _ = gmm.sample(50_000)
    log_p_ind = gmm.score_samples(x_mc)
    log_ps = np.stack([
        multivariate_normal(
            true_means[k], true_covs[k] + 1e-8 * np.eye(dim), allow_singular=True
        ).logpdf(x_mc)
        for k in range(n_comp)
    ])
    m = log_ps.max(0)
    log_p_true = m + np.log(np.exp(log_ps - m).sum(0)) - np.log(n_comp)
    return float(np.mean(log_p_ind - log_p_true))


_PROFILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdm_tpu", "config", "yaml", "high_dim_exp.yaml",
)


def main() -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdm_tpu.config.loader import load_config
    from pdm_tpu.diffusion.sampling import get_samples
    from pdm_tpu.models.base import TrueDDPM
    from pdm_tpu.ops.mmd import mmd_rbf
    from pdm_tpu.schedulers.analytic import CosineScheduler, LogSNRScheduler
    from pdm_tpu.schedulers.interpolated import entropy_scheduler, metric_scheduler
    from pdm_tpu.stats.sweep import thermo_sweep
    from pdm_tpu.utils.synthetic import generate_anisotropic_gmm

    # scale constants come from the committed alternate root profile
    # (pdm_tpu/config/yaml/high_dim_exp.yaml, parity: reference
    # config/high_dim_exp.yaml + scripts/reproduce_high_dim.py:125-137) —
    # PDM_CONFIG still overrides, same as every pipeline script.
    config = load_config(os.environ.get("PDM_CONFIG") or _PROFILE)
    # melt to max_temp=1e4: for 100-D N(0,I)-separated modes, T=1e2 is
    # NOT yet melted (sqrt(ab)*|mu_i-mu_j| ~ 1.4), so the reverse process
    # would start from the wrong marginal and bias mode occupancy
    dim = config.dataset_config.image_size[0]
    n_comp = 5  # data-generation fact (reference :18), not a config knob
    n_train, n_gen = 50_000, config.sample.n_samples
    min_temp, max_temp = config.diffusion.temp_range

    print(f"Generating data (dim={dim}, components={n_comp}, n={n_train})...")
    train_data, true_means, true_covs = generate_anisotropic_gmm(
        dim=dim, n_components=n_comp, n_samples=n_train
    )
    data = jnp.asarray(train_data)

    ensure_dirs("stats")
    temps = np.logspace(
        np.log10(min_temp), np.log10(max_temp), config.forward_stats.n_temps
    )
    print("Computing forward + metric stats (one fused sweep)...")
    stats = thermo_sweep(
        jax.random.PRNGKey(0), data, temps,
        n_samples=config.forward_stats.n_samples,
        batch_size=config.forward_stats.batch_size,
    )
    np.savez("stats/anisotropic_gmm_repro_forward.npz",
             temp=stats["temp"], entropy=stats["entropy"])
    np.savez("stats/anisotropic_gmm_repro_metric.npz",
             temp=stats["temp"], metric=stats["metric"],
             log_temp=stats["log_temp"],
             dataset_tr_sigma0=stats["dataset_tr_sigma0"])

    schedulers = {
        "Linear log-SNR": LogSNRScheduler(min_temp, max_temp),
        "Cosine": CosineScheduler(min_temp, max_temp),
        "Entropic": entropy_scheduler(stats["temp"], stats["entropy"],
                                      extrapolate=False),
        "Metric": metric_scheduler(stats["log_temp"], stats["metric"]),
    }

    # diagnostic plots
    plt.figure(figsize=(15, 10))
    plt.subplot(2, 2, 1)
    tau = jnp.linspace(0, 1, 100)
    for name, sch in schedulers.items():
        lw = 2 if name in ("Cosine", "Metric") else 1
        alpha = 1.0 if lw == 2 else 0.3
        plt.plot(np.asarray(tau), np.exp(np.asarray(sch.log_temp_from_tau(tau))),
                 label=name, linewidth=lw, alpha=alpha)
    plt.yscale("log"); plt.legend(); plt.grid(alpha=0.3)
    plt.xlabel("tau"); plt.ylabel("Temperature"); plt.title("Temperature vs Time")

    plt.subplot(2, 2, 2)
    sqrt_g = np.sqrt(np.clip(stats["metric"], 0, None))
    dr = 0.5 * (sqrt_g[1:] + sqrt_g[:-1]) * np.diff(stats["log_temp"])
    r = np.concatenate([[0], np.cumsum(dr)])
    plt.semilogx(stats["temp"], r)
    plt.xlabel("Temperature"); plt.ylabel("r(0, sigma)")
    plt.title("Fisher-Rao distance"); plt.grid(alpha=0.3)

    plt.subplot(2, 2, 3)
    plt.semilogx(stats["temp"], stats["entropy"], "k--")
    plt.xlabel("Temperature"); plt.ylabel("Entropy"); plt.grid(alpha=0.3)

    plt.subplot(2, 2, 4)
    plt.loglog(stats["temp"], stats["metric"], "b-", label="Empirical G")
    plt.loglog(stats["temp"], float(stats["dataset_tr_sigma0"]) / stats["temp"],
               "r--", label="Tail Tr(Sigma0)/sigma^2")
    plt.legend(); plt.grid(which="both", alpha=0.3)
    plt.xlabel("Temperature"); plt.ylabel("Metric G")
    plt.tight_layout()
    plt.savefig("high_dim_plots.png")
    print("Saved high_dim_plots.png")

    def sample_with(scheduler, name):
        print(f"Sampling with {name} schedule...")
        ddpm = TrueDDPM(scheduler=scheduler, train_data=data)
        out = get_samples(
            ddpm, scheduler, n_steps=config.sample.n_steps,
            obj_size=(1, dim, 1), n_samples=n_gen,
            batch_size=min(n_gen, config.sample.batch_size),
            step_type=config.sample.step_type,
            key=jax.random.PRNGKey(1),
        )
        return out["x"].reshape(n_gen, dim)

    samples = {
        "Cosine": sample_with(schedulers["Cosine"], "Cosine"),
        "Metric": sample_with(schedulers["Metric"], "Metric"),
    }
    rng = np.random.RandomState(0)
    flat = train_data.reshape(n_train, dim)
    ref = flat[rng.randint(0, n_train, n_gen)]
    samples = {"Baseline (True)": flat[rng.randint(0, n_train, n_gen)], **samples}

    print("-" * 85)
    print(f"{'Schedule':<20} | {'MMD':<10} | {'KL':<10} | {'Avg MSE':<10} | Component Dist.")
    print("-" * 85)
    for name, x in samples.items():
        mmd = float(mmd_rbf(jnp.asarray(x[:5000]), jnp.asarray(ref[:5000]),
                            sigmas=(float(np.sqrt(dim)),)))
        kl = compute_kl_gmm(x.astype(np.float64), true_means.astype(np.float64),
                            true_covs.astype(np.float64))
        d = ((x[:, None, :] - true_means[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        occ = np.bincount(assign, minlength=n_comp) / len(x)
        mse = np.nanmean([
            ((x[assign == i] - true_means[i]) ** 2).sum(1).mean()
            if (assign == i).any() else np.nan
            for i in range(n_comp)
        ])
        occ_str = ", ".join(f"{v:.2f}" for v in occ)
        print(f"{name:<20} | {mmd:<10.6f} | {kl:<10.4f} | {mse:<10.4f} | [{occ_str}]")
    print("-" * 85)


if __name__ == "__main__":
    main()
