"""Serving export: freeze a sampler into a portable StableHLO artifact.

Production serving wants the reverse-process graph compiled AHEAD of time
and decoupled from Python model code: ``export_sampler`` lowers the
sampler's whole jitted scan (parameters baked in as constants) through
``jax.export`` and writes a single serialized StableHLO blob + a JSON
manifest. ``load_exported`` rehydrates it in any process — no pdm_tpu,
flax, or checkpoint needed — and runs it on the target backend.

This is a new capability vs the reference (whose serving story is
"load torch checkpoint and run the pipeline object"); it is the
TPU-native deployment path: the artifact is backend-portable IR that the
serving runtime compiles once and replays.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_sampler(
    sampler,
    path: str,
    *,
    platforms: Optional[Tuple[str, ...]] = None,
) -> str:
    """Serialize ``sampler.batch_sample`` (keyed by a PRNG seed) to
    ``path`` (.stablehlo) + ``path``.json manifest. Returns the path."""
    from jax import export as jexport

    from ..diffusion.sampling import _sample_scan

    # static pieces (schedule grid discretization calls host-side float())
    # are computed EAGERLY; only the pure scan is traced for export
    grid = sampler._grid()
    shape = (sampler.batch_size, *sampler.obj_size)

    def serve(seed: jax.Array):
        xt, _ = _sample_scan(
            sampler.ddpm, grid, jax.random.PRNGKey(seed[0]), shape,
            sampler.step_type, sampler.precision == "half", False, None,
        )
        return xt

    fn = jax.jit(serve)
    args = (jnp.zeros((1,), jnp.uint32),)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exp = jexport.export(fn, **kwargs)(*args)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    manifest = {
        "entry": "serve(seed: uint32[1]) -> x",
        "batch_size": sampler.batch_size,
        "n_steps": sampler.n_steps,
        "step_type": sampler.step_type,
        "obj_size": list(sampler.obj_size),
        "precision": sampler.precision,
        "platforms": list(exp.platforms),
        "out_shape": [sampler.batch_size, *sampler.obj_size],
        "bytes": len(blob),
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_exported(path: str):
    """Rehydrate an exported sampler: returns ``fn(seed_uint32) ->
    (batch, *obj_size) array`` plus the manifest dict."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    manifest = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)

    def fn(seed: int):
        seed_arr = jnp.asarray([seed], jnp.uint32)
        return exp.call(seed_arr)

    return fn, manifest
