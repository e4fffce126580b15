"""Freeze the configured sampler into a serving artifact (StableHLO).

    python export_sampler.py --dataset_name cifar10 \
        --sample.noise_schedule_type entropy --sample.n_steps 50 \
        --out serving/cifar10_entropy50.stablehlo

The artifact + manifest are self-contained: a serving process deserializes
with jax.export and replays the whole reverse process (weights baked in)
without pdm_tpu or checkpoints. See pdm_tpu/utils/serving.py.
"""
import os
import sys

from _common import ensure_dirs, setup_jax
from pdm_tpu.config.config import Config
from pdm_tpu.config.loader import (
    load_config, parse_args_from_config, update_config_from_args,
)


def main(config: Config, out: str = "") -> None:
    setup_jax()
    from sample import build_sampler

    from pdm_tpu.utils.serving import export_sampler

    sampler = build_sampler(config)
    out = out or (
        f"serving/{config.experiment_name}_"
        f"{config.sample.noise_schedule_type}{config.sample.n_steps}.stablehlo"
    )
    ensure_dirs(os.path.dirname(out) or ".")
    path = export_sampler(sampler, out)
    size = os.path.getsize(path)
    print(f"exported {path} ({size / 1e6:.1f} MB) + {path}.json")


if __name__ == "__main__":
    # split our --out flag from the config auto-CLI flags
    argv = sys.argv[1:]
    out = ""
    for i, a in enumerate(argv):
        if a == "--out":
            if i + 1 >= len(argv):
                sys.exit("usage: export_sampler.py [--out PATH] [config flags]")
            out = argv[i + 1]
            del argv[i : i + 2]
            break
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
            del argv[i]
            break
    cfg = load_config()
    update_config_from_args(cfg, parse_args_from_config(cfg, argv))
    main(cfg, out=out)
