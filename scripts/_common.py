"""Shared script bootstrap: repo on path, persistent compile cache, helpers."""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def setup_jax(cache: bool = True) -> None:
    import jax

    # The persistent cache only helps the TPU path; on CPU the entries were
    # AOT-compiled by the remote-compile service for a different host CPU
    # and just produce loader warnings, so skip it there.
    if cache and "axon" in os.environ.get("JAX_PLATFORMS", "axon"):
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO_ROOT, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def ensure_dirs(*names: str) -> None:
    for name in names:
        os.makedirs(name, exist_ok=True)


def temp_grid(min_temp: float, max_temp: float, n: int):
    import numpy as np

    return np.logspace(np.log10(min_temp), np.log10(max_temp), n)
