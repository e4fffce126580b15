"""FID sweep over (n_steps x schedule x min_temp) -> fid/{exp}.csv
(parity: reference scripts/compute_fid.py)."""
from itertools import product

from _common import ensure_dirs, setup_jax
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from pdm_tpu.models.from_config import ddpm_from_config
    from pdm_tpu.parallel.mesh import mesh_from_config
    from pdm_tpu.utils.data import get_data_tensor
    from pdm_tpu.utils.fid import get_compute_fid, get_feature_fn
    from sample import build_sampler

    ensure_dirs("fid", "samples")
    # feature extraction shards over the 'data' axis; moments psum-reduce
    mesh = mesh_from_config(config.parallel)
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)}")
    reference = get_data_tensor(config, train=config.fid.train)
    feature_fn, fdim = get_feature_fn(config.dataset_name)
    compute_fid = get_compute_fid(reference, feature_fn, fdim, mesh=mesh)
    ddpm = ddpm_from_config(config, pretrained=True)

    rows = []
    paths = config.fid.noise_schedule_path or [None] * len(
        config.fid.noise_schedule_type
    )
    if len(paths) != len(config.fid.noise_schedule_type):
        raise ValueError(
            f"fid.noise_schedule_path has {len(paths)} entries for "
            f"{len(config.fid.noise_schedule_type)} schedule types — a "
            f"shorter list would silently drop sweep rows; pad with null"
        )
    # snapshot ONCE: build_sampler mutates config (entropy min_temp etc.),
    # which would otherwise move experiment_name/fid_results_path between
    # iterations and split the table across two CSVs
    results_path = config.fid_results_path
    n_fid = config.fid.samples or config.dataset_config.fid_samples
    for n_steps, (schedule, path), min_temp in product(
        config.fid.n_steps,
        zip(config.fid.noise_schedule_type, paths),
        config.fid.min_temp,
    ):
        config.sample.n_steps = n_steps
        config.sample.noise_schedule_type = schedule
        config.sample.noise_schedule_path = path
        config.sample.n_samples = n_fid
        if config.fid.sample:
            sampler = build_sampler(config, ddpm=ddpm, min_temp=min_temp)
            samples = sampler.sample()["x"]
        else:
            # reuse previously saved samples (reference fid.sample=false,
            # truncated to the FID protocol count like the reference)
            samples = np.load(config.samples_path + ".npz")["x"][:n_fid]
        fid = compute_fid(jnp.asarray(samples))
        rows.append(dict(n_steps=n_steps, schedule=schedule,
                         min_temp=min_temp, fid=fid))
        print(rows[-1])
        pd.DataFrame(rows).to_csv(results_path, index=False)
    print(f"saved {results_path}")


if __name__ == "__main__":
    main()
